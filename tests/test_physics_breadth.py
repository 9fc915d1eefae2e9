"""Tests for the breadth physics: porous (Darcy + Richards/van Genuchten),
Spalart-Allmaras, potential/Butler-Volmer, Reynolds lubrication."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    ButlerVolmerBC,
    PorousFlow,
    Potential,
    ReynoldsFilm,
    SpalartAllmaras,
    VanGenuchten,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def line_mesh(nx, L=1.0, ny=1):
    return rectangle_mesh(nx, ny, elem="QUAD4", xlim=(0, L), ylim=(0, 0.1))


def test_darcy_saturated_flux():
    mesh = line_mesh(10, L=2.0)
    prob = Problem(mesh, [PorousFlow(model=None, transient=False)],
                   {"permeability": 3.0, "mu_liquid": 1.5})
    prob.add_dirichlet("left", "porous_pressure", 0, 1.0)
    prob.add_dirichlet("right", "porous_pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, linear_tol=1e-12)).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    p = prob.get_nodal_field(res.x, "porous_pressure")
    np.testing.assert_allclose(p, 1.0 - mesh.coords[:, 0] / 2.0, atol=1e-10)


def test_richards_hydrostatic_equilibrium():
    """With gravity, p = -rho*g*x (head decreasing upward) is an exact
    no-flow steady state of Richards' equation regardless of k_r(p)."""
    mesh = line_mesh(8, L=1.0)
    vg = VanGenuchten(alpha=2.0, n=2.0)
    rho_g = 1.0
    prob = Problem(mesh, [PorousFlow(model=vg, transient=False)],
                   {"permeability": 1.0, "mu_liquid": 1.0, "porosity": 0.4,
                    "gravity_vec": np.array([-rho_g, 0.0]), "rho_liquid": 1.0})
    phydro = lambda c: -rho_g * c[:, 0]
    prob.add_dirichlet("left", "porous_pressure", 0, 0.0)
    prob.add_dirichlet("right", "porous_pressure", 0, -rho_g * 1.0)
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "porous_pressure", 0, phydro)
    R = np.asarray(prob.residual(x0, prob.base_params()))
    assert np.max(np.abs(R)) < 1e-12
    # and Newton stays there
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, linear_solver="direct")).solve(
        x0, prob.base_params()
    )
    assert res.converged and res.iters == 0


def test_richards_infiltration_runs():
    """Transient infiltration into dry soil converges and conserves
    monotonicity (saturation front)."""
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    mesh = line_mesh(16, L=1.0)
    vg = VanGenuchten(alpha=3.0, n=1.8)
    prob = Problem(mesh, [PorousFlow(model=vg, transient=True)],
                   {"permeability": 1.0, "mu_liquid": 1.0, "porosity": 0.4})
    prob.add_dirichlet("left", "porous_pressure", 0, 0.0)  # wet boundary
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "porous_pressure", 0, -3.0)
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=10, tol_residual=1e-9, linear_solver="direct"),
        TimeOptions(dt0=1e-3, t_end=0.01, adapt=True, eps_time=0.05),
    )
    res = ts.run(x0, prob.base_params())
    p = prob.get_nodal_field(res.x, "porous_pressure")
    bottom = np.abs(mesh.coords[:, 1]) < 1e-12
    xo = np.argsort(mesh.coords[bottom, 0])
    pb = p[bottom][xo]
    assert pb[0] == pytest.approx(0.0, abs=1e-10)
    # a sharp front with one bounded Galerkin undershoot node is acceptable
    assert pb.min() > -4.5
    assert pb[1] > -1.0  # front has wetted the first interior node
    # far field undisturbed
    np.testing.assert_allclose(pb[-4:], -3.0, atol=1e-3)


def test_spalart_allmaras_uniform_decay():
    """Uniform nu_t with constant wall distance: pure destruction ODE.
    Cross-check the PDE solve against scipy integration of the same RHS."""
    from scipy.integrate import solve_ivp
    from goma_tpu.physics.turbulence import CW1, CW2, CW3, KAPPA, fv1
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    nu, d = 1e-2, 0.5
    mesh = line_mesh(4)
    prob = Problem(mesh, [SpalartAllmaras(nu=nu, transient=True, supg=0.0)],
                   {}, external_fields=("wall_distance",))
    prob.finalize()
    nut0 = 0.05
    x0 = np.full(prob.dofmap.n_dof, nut0)
    params = prob.base_params(ext_wall_distance=jnp.full(mesh.n_nodes, d))

    def rhs(t, y):
        nut = y[0]
        chi = nut / nu
        fv2 = 1 - chi / (1 + chi * fv1(chi))
        Stilde = max(nut / (KAPPA**2 * d**2) * fv2, 0.0)  # kernel clips at 0.3*S (S=0)
        rr = np.clip(nut / (max(Stilde, 1e-10) * KAPPA**2 * d**2), 0, 10)
        g = rr + CW2 * (rr**6 - rr)
        fw = g * ((1 + CW3**6) / (g**6 + CW3**6)) ** (1 / 6)
        prod = 0.1355 * Stilde * nut
        dest = CW1 * fw * (nut / d) ** 2
        return [prod - dest]

    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-11, linear_solver="direct"),
        TimeOptions(dt0=1e-3, t_end=0.5, adapt=True, eps_time=1e-4, rel_tol=1e-6),
    )
    res = ts.run(x0, params)
    ref = solve_ivp(rhs, (0, res.t), [nut0], rtol=1e-10, atol=1e-12).y[0, -1]
    got = np.mean(prob.get_nodal_field(res.x, "turb_nu"))
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_butler_volmer_electrode():
    kappa, L = 2.0, 1.0
    i0, aa, ac, Vm = 0.5, 0.5, 0.5, 0.2
    mesh = line_mesh(10, L=L)
    prob = Problem(mesh, [Potential(interp="Q1")], {"kappa": kappa})
    prob.add_dirichlet("right", "voltage", 0, 0.0)
    prob.add_face_kernel("left", ButlerVolmerBC(i0, aa, ac, Vm))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, tol_residual=1e-12,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    V = prob.get_nodal_field(res.x, "voltage")
    Vs = V[mesh.nodesets["left"]].mean()
    # analytic: kappa Vs / L = i(Vm - Vs)
    from scipy.optimize import brentq
    from goma_tpu.physics.electro import FARADAY, GAS_R

    f = FARADAY / (GAS_R * 298.15)
    eq = lambda v: kappa * v / L - i0 * (np.exp(aa * f * (Vm - v)) - np.exp(-ac * f * (Vm - v)))
    v_exact = brentq(eq, -1, 1)
    np.testing.assert_allclose(Vs, v_exact, rtol=1e-8)
    # linear profile
    np.testing.assert_allclose(V, Vs * (1 - mesh.coords[:, 0] / L), atol=1e-8)
    # regression: residual-only path must include face-kernel contributions
    # (it once raised NameError / silently dropped faces)
    R_only = np.asarray(prob.residual(res.x, prob.base_params()))
    R_full, _ = prob.assemble(res.x, prob.base_params())
    np.testing.assert_allclose(R_only, np.asarray(R_full), atol=1e-12)


def test_reynolds_slider_bearing():
    mu, U, h1, h2, L = 0.1, 2.0, 0.2, 0.1, 1.0
    mesh = line_mesh(40, L=L)
    gap = lambda fv, mat, params: h1 + (h2 - h1) * fv.x[:, 0] / L
    prob = Problem(mesh, [ReynoldsFilm(interp="Q1")],
                   {"gap": gap, "mu_lub": mu, "wall_velocity": np.array([U, 0.0])})
    prob.add_dirichlet("left", "lub_pressure", 0, 0.0)
    prob.add_dirichlet("right", "lub_pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, linear_tol=1e-13,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    p = prob.get_nodal_field(res.x, "lub_pressure")

    # reference: integrate p' = 6 mu U / h^2 + 12 mu C / h^3 with p(L)=0
    xs = np.linspace(0, L, 4001)
    h = h1 + (h2 - h1) * xs / L
    # C from requiring integral of p' over [0,L] to vanish
    a = np.trapezoid(6 * mu * U / h**2, xs)
    b = np.trapezoid(12 * mu / h**3, xs)
    C = -a / b
    pr = np.cumsum((6 * mu * U / h**2 + 12 * mu * C / h**3)) * (xs[1] - xs[0])
    pr -= pr[0]
    bottom = np.abs(mesh.coords[:, 1]) < 1e-12
    xo = np.argsort(mesh.coords[bottom, 0])
    pb = p[bottom][xo]
    xb = np.sort(mesh.coords[bottom, 0])
    pref = np.interp(xb, xs, pr)
    assert np.max(np.abs(pb - pref)) < 0.02 * np.max(np.abs(pr))
    # positive pressure hump for converging gap
    assert pb.max() > 0


def test_hor_orr_surface_kinetics():
    """HOR/ORR surface-kinetics fluxes (mass_flux_surf_HOR:2134 /
    mass_flux_surf_ORR:2195): 1D diffusion with a consuming electrode —
    the steady profile satisfies the mixed BC exactly:
    -D c'(L) = q(c(L)) with the ORR Tafel rate, linear interior profile."""
    import jax.numpy as jnp
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Species
    from goma_tpu.physics.electro import FARADAY, GAS_R, ORRFlux
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    D, c0, L = 1.0, 1.0, 1.0
    ai0, H, n, ac, U0, beta, cref, V, T = 2.0, 1.0, 4.0, 0.5, 0.2, 1.0, 1.0, 0.4, 298.15
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.25))
    prob = Problem(mesh, [Species(n_species=1, interp="Q2", transient=False,
                                  convection=False)], {"D": D})
    prob.add_dirichlet("left", "species", 0, c0)
    prob.add_face_kernel("right", ORRFlux(ai0=ai0, H=H, n=n, alpha_c=ac,
                                          U0=U0, beta=beta, cref=cref, V=V, T=T))
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, c0)
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, tol_residual=1e-12,
                                           linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "species", 0)
    # exact: c(x) = c0 - m x with flux balance m D = k (c0 - m L) e^{-f(V-U0)}
    k = ai0 * H / (n * FARADAY)
    rate0 = k * np.exp(-ac * FARADAY / (GAS_R * T) * (V - U0))
    m = rate0 * c0 / (D + rate0 * L)
    np.testing.assert_allclose(c, c0 - m * mesh.coords[:, 0], atol=1e-10)


def test_species_electromigration_boltzmann():
    """Charged-species migration (FICKIAN_CHARGED parity): steady
    diffusion-migration equilibrium against a solved linear potential gives
    the Boltzmann profile c = c0 exp(-z u F (V - V0) / D); the no-flux
    outflow is the natural BC of the weak form."""
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Potential, Species
    from goma_tpu.physics.electro import FARADAY
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    D, z, um, V1, c0, L = 1.0, 1.0, 1.5 / (FARADAY * 0.2), 0.2, 1.0, 1.0
    mesh = rectangle_mesh(10, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.25))
    prob = Problem(mesh, [Species(n_species=1, interp="Q2", transient=False,
                                  convection=False),
                          Potential(interp="Q2")],
                   {"diffusivity": D, "kappa": 1.0,
                    "charge": (z,), "mobility": (um,)})
    prob.add_dirichlet("left", "species", 0, c0)
    prob.add_dirichlet("left", "voltage", 0, 0.0)
    prob.add_dirichlet("right", "voltage", 0, V1)
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, c0)
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, tol_residual=1e-12,
                                           linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "species", 0)
    x = mesh.coords[:, 0]
    V = V1 * x / L
    exact = c0 * np.exp(-z * um * FARADAY * V / D)
    np.testing.assert_allclose(c, exact, atol=2e-4)


def test_continuity_mass_source():
    """Volumetric mass source (foam/REF sources of assemble_continuity):
    div u = s with constant s has the exact expanding solution
    u = (s x, 0), p = const on a channel with matching Dirichlet walls."""
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    s, L = 2.0, 1.0
    mesh = rectangle_mesh(6, 4, elem="QUAD9", xlim=(0, L), ylim=(0, 0.5))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False,
                                   convection=False),
                          Continuity(interp="Q1")],
                   {"rho": 0.0, "mu": 1.0, "mass_source": s})
    lin = lambda c: s * c[:, 0]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, lin)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=4, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    p = prob.get_nodal_field(res.x, "pressure", 0)
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], s * mesh.coords[mask, 0], atol=1e-9)
    np.testing.assert_allclose(p[~np.isnan(p)], 0.0, atol=1e-8)
