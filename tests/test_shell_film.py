"""Free-surface film flow + particles + shell energy validation.

Exact-solution anchors:
- capillary leveling: a small sinusoidal film perturbation decays at the
  classic fourth-order thin-film rate lambda = sigma h0^3 k^4 / (3 mu)
  (linearized assemble_film system, mm_fill_shell.c:8491);
- evaporative particle concentration: on a flat film with constant
  evaporation E, H(t) = H0 - E t and C(t) = C0 H0 / H(t) (particle mass
  H C conserved, assemble_film_particles mm_fill_shell.c:10188);
- shell energy fin: steady -d/dx(H k dT/dx) + ht (T - Tamb) = 0 with
  T(0) = T0, zero flux at x = L has T = Tamb + (T0 - Tamb)
  cosh(m(L-x))/cosh(mL), m = sqrt(ht/(H k)) (assemble_shell_energy
  mm_fill_shell.c:7133 conduction + Lub_Heat_Xfer loss).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (FilmHeight, FilmParticles, FilmPressure,
                              ShellEnergy, attach_shell_block)
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def _film_mesh(nx=24, L=1.0):
    mesh = rectangle_mesh(nx, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.05))
    bi = attach_shell_block(mesh, "bottom", "film")
    return mesh, bi


def test_capillary_leveling_rate():
    """Sinusoidal film perturbation decays at sigma h0^3 k^4/(3 mu)."""
    L, h0, eps, sigma, mu = 1.0, 1.0, 1e-3, 1.0, 1.0
    k = np.pi / L
    lam = sigma * h0**3 * k**4 / (3.0 * mu)
    mesh, bi = _film_mesh(nx=28, L=L)
    prob = Problem(
        mesh,
        [[], [FilmPressure(interp="Q2", transient=True),
              FilmHeight(interp="Q2")]],
        [{}, {"mu": mu, "sigma": sigma}])
    prob.finalize()
    xs = mesh.coords[:, 0]
    H0 = h0 + eps * np.cos(k * xs)
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "film_height", 0, H0)
    # consistent initial pressure P = -sigma H'' = sigma eps k^2 cos(kx)
    x0 = prob.set_nodal_field(x0, "film_pressure", 0,
                              sigma * eps * k**2 * np.cos(k * xs))
    t_end = 0.2 / lam
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-10,
                            linear_solver="direct"),
        TimeOptions(dt0=t_end / 40, t_end=t_end, adapt=False, theta=0.5))
    r = ts.run(x0, prob.base_params())
    assert all(s.converged for s in r.steps)
    sn = np.unique(mesh.blocks[bi].conn)
    H = prob.get_nodal_field(r.x, "film_height", 0)[sn]
    amp = 0.5 * (H.max() - H.min())
    expect = eps * np.exp(-lam * r.t)
    assert amp == pytest.approx(expect, rel=0.05)


def test_film_evaporation_concentrates_particles():
    """Flat film, constant E: H = H0 - E t, C = C0 H0 / H (mass H*C
    conserved)."""
    H0, C0, E = 1.0, 0.1, 0.5
    mesh, bi = _film_mesh(nx=6)
    prob = Problem(
        mesh,
        [[], [FilmPressure(interp="Q2", transient=True),
              FilmHeight(interp="Q2"),
              FilmParticles(interp="Q2", transient=True)]],
        [{}, {"mu": 1.0, "sigma": 1.0, "evap": E, "D_partc": 0.0}])
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "film_height", 0, H0)
    x0 = prob.set_nodal_field(x0, "film_conc", 0, C0)
    t_end = 0.6  # H: 1.0 -> 0.7
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-11,
                            linear_solver="direct"),
        TimeOptions(dt0=0.05, t_end=t_end, adapt=False, theta=0.5))
    r = ts.run(x0, prob.base_params())
    assert all(s.converged for s in r.steps)
    sn = np.unique(mesh.blocks[bi].conn)
    H = prob.get_nodal_field(r.x, "film_height", 0)[sn]
    C = prob.get_nodal_field(r.x, "film_conc", 0)[sn]
    np.testing.assert_allclose(H, H0 - E * r.t, rtol=1e-6)
    np.testing.assert_allclose(C, C0 * H0 / (H0 - E * r.t), rtol=1e-3)


def test_shell_energy_fin_exact():
    """Steady conduction fin with ambient loss vs cosh exact solution."""
    L, Hk, ht, T0, Tamb = 1.0, 0.05, 4.0, 2.0, 0.5
    m = np.sqrt(ht / Hk)
    mesh, bi = _film_mesh(nx=30, L=L)
    mesh.nodesets["root"] = np.array(
        [np.argmin(np.abs(mesh.coords[:, 0]) + np.abs(mesh.coords[:, 1]))],
        dtype=np.int32)
    prob = Problem(
        mesh,
        [[], [ShellEnergy(interp="Q2", transient=False)]],
        [{}, {"rho": 1.0, "Cp": 1.0, "k": Hk, "gap": 1.0,
              "ht_coeff": ht, "ht_tamb": Tamb}])
    # clamp the root end (all shell nodes at x=0)
    prob.add_dirichlet("left", "shell_temperature", 0, T0)
    prob.finalize()
    solver = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                              linear_solver="direct"))
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "shell_temperature", 0)
    shell_nodes = np.unique(mesh.blocks[1].conn)
    xs = mesh.coords[shell_nodes, 0]
    Tex = Tamb + (T0 - Tamb) * np.cosh(m * (L - xs)) / np.cosh(m * L)
    np.testing.assert_allclose(T[shell_nodes], Tex, rtol=2e-3, atol=2e-3)


def test_disjoining_pressure_models():
    from goma_tpu.physics.shell_film import (disjoining_one_term,
                                             disjoining_two_term)

    pi2 = disjoining_two_term(60.0, 3.0, 2.0, 0.01, factor=1.0)
    H = jnp.asarray([0.01, 0.02, 0.1])
    v = pi2(H, {"sigma": 1.0})
    # at H = H*: f = 1 - factor = 0
    assert abs(float(v[0])) < 1e-10
    # attractive tail decays
    assert abs(float(v[2])) < abs(float(v[1]))
    pi1 = disjoining_one_term(2.0, 3.0, 0.01)
    np.testing.assert_allclose(float(pi1(jnp.asarray([0.01]), {})[0]), 2.0)


def test_shell_species_advection_diffusion_exact():
    """Gap-integrated species transport (assemble_shell_species,
    mm_fill_shell.c:8095): steady advection-diffusion boundary layer in
    a uniform lubrication flux vs the exact exponential profile
    c = (exp(Pe x/L)-1)/(exp(Pe)-1), Pe = qL/(H D)."""
    from goma_tpu.physics import ShellSpecies

    L, H, D, q = 1.0, 0.2, 0.05, 0.04
    Pe = q * L / (H * D)
    mesh, bi = _film_mesh(nx=40, L=L)
    qf = lambda fv, mat, params: jnp.broadcast_to(
        jnp.array([q, 0.0]), (fv.x.shape[0], 2))
    prob = Problem(
        mesh,
        [[], [ShellSpecies(interp="Q2", transient=False)]],
        [{}, {"D_shell": D, "gap": H, "lub_flux": qf}])
    prob.add_dirichlet("left", "shell_species", 0, 0.0)
    prob.add_dirichlet("right", "shell_species", 0, 1.0)
    prob.finalize()
    solver = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                              linear_solver="direct"))
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "shell_species", 0)
    shell_nodes = np.unique(mesh.blocks[1].conn)
    xs = mesh.coords[shell_nodes, 0]
    cex = (np.exp(Pe * xs / L) - 1.0) / (np.exp(Pe) - 1.0)
    np.testing.assert_allclose(c[shell_nodes], cex, rtol=2e-3, atol=2e-3)


def test_shell_species_source_decay_transient():
    """Transient well-mixed balance H dc/dt = s with a constant source:
    uniform concentration grows linearly at rate s/H."""
    from goma_tpu.physics import ShellSpecies

    H, s, t_end = 0.5, 0.3, 0.4
    mesh, bi = _film_mesh(nx=6)
    prob = Problem(
        mesh,
        [[], [ShellSpecies(interp="Q2", transient=True)]],
        [{}, {"D_shell": 0.01, "gap": H, "shell_species_source": s}])
    prob.finalize()
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=6, tol_residual=1e-12,
                            linear_solver="direct"),
        TimeOptions(dt0=0.05, t_end=t_end, adapt=False))
    r = ts.run(np.zeros(prob.dofmap.n_dof), prob.base_params())
    c = prob.get_nodal_field(r.x, "shell_species", 0)
    shell_nodes = np.unique(mesh.blocks[1].conn)
    np.testing.assert_allclose(c[shell_nodes], s / H * t_end,
                               rtol=1e-8, atol=1e-10)
