"""Porous-shell family validation (closed/open/stacked layers).

Anchors:
- closed-cell imbibition (assemble_porous_shell_closed + dPdz_function,
  mm_fill_shell.c:11117,10869): spatially uniform deck reduces to the ODE
  dS/dt = (k/(mu phi_p H)) (P_lub + P_cap - P_gas(S))/(S H); compared
  against scipy solve_ivp;
- open-cell linearized Richards (assemble_porous_shell_open,
  mm_fill_shell.c:11945): linear retention + constant krel reduce to a
  diffusion equation whose sinusoid decays at D k^2 with
  D = k_perm/(mu phi_p c);
- two-layer stack (assemble_porous_shell_saturation,
  mm_fill_shell.c:13197): interlayer exchange conserves total liquid and
  equilibrates capillary pressure.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (PorousShellClosed, PorousShellOpen,
                              PorousShellStackLayer, attach_shell_block)
from goma_tpu.solvers import NewtonOptions
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def _shell(nx=8, L=1.0):
    mesh = rectangle_mesh(nx, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.05))
    bi = attach_shell_block(mesh, "bottom", "porous")
    return mesh, bi


MAT_CLOSED = {"porosity": 0.4, "pore_radius": 0.02, "pore_height": 1.0,
              "mu": 1.0, "sigma": 1.0, "contact_angle_deg": 30.0,
              "P0": 0.2, "nbar": 1.0, "lub_pressure": 0.5}


def _closed_rhs(t, S):
    m = MAT_CLOSED
    k = m["porosity"] * m["pore_radius"] ** 2 / 8.0
    Pcap = 2 * m["sigma"] * np.cos(np.deg2rad(m["contact_angle_deg"])) \
        / m["pore_radius"]
    H = m["pore_height"]
    Pgas = m["P0"] * m["nbar"] / (1.0 - S)
    dPdz = (Pgas - m["lub_pressure"] - Pcap) / (S * H)
    vz = -(k / m["mu"]) * dPdz
    return vz / (m["porosity"] * H)


def test_closed_cell_imbibition_ode():
    from scipy.integrate import solve_ivp

    mesh, bi = _shell(nx=4)
    prob = Problem(mesh, [[], [PorousShellClosed(interp="Q2")]],
                   [{}, dict(MAT_CLOSED)])
    prob.finalize()
    S0 = 0.05
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "shell_sat_closed", 0, S0)
    t_end = 2.0
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-12,
                            linear_solver="direct"),
        TimeOptions(dt0=0.02, t_end=t_end, adapt=False, theta=0.5))
    r = ts.run(x0, prob.base_params())
    assert all(s.converged for s in r.steps)
    sn = np.unique(mesh.blocks[bi].conn)
    S = prob.get_nodal_field(r.x, "shell_sat_closed", 0)[sn]
    ref = solve_ivp(_closed_rhs, (0, r.t), [S0], rtol=1e-10,
                    atol=1e-12).y[0, -1]
    assert S.std() < 1e-10  # stays uniform
    assert S.mean() == pytest.approx(ref, rel=2e-3)
    assert S.mean() > S0  # capillary suction fills the pores


def test_open_cell_diffusion_rate():
    """Linear retention S = S0 + c P, krel = 1: P diffuses with
    D = k/(mu phi_p c); sinusoid decays at D k^2."""
    from goma_tpu.physics.shell_porous import linear_retention

    L, c, kperm, mu, phi_p, Hl = 1.0, 0.5, 0.01, 1.0, 0.4, 1.0
    D = kperm / (mu * phi_p * c)
    kw = np.pi / L
    lam = D * kw**2
    mesh, bi = _shell(nx=20, L=L)
    prob = Problem(
        mesh,
        [[], [PorousShellOpen(interp="Q2", transient=True)]],
        [{}, {"porosity": phi_p, "permeability": kperm, "mu": mu,
              "gap": Hl, "retention": linear_retention(S0=0.5, c=c)}])
    prob.finalize()
    xs = mesh.coords[:, 0]
    eps = 1e-3
    P0 = eps * np.cos(kw * xs)
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "shell_press_open", 0, P0)
    t_end = 0.3 / lam
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-12,
                            linear_solver="direct"),
        TimeOptions(dt0=t_end / 40, t_end=t_end, adapt=False, theta=0.5))
    r = ts.run(x0, prob.base_params())
    assert all(s.converged for s in r.steps)
    sn = np.unique(mesh.blocks[bi].conn)
    P = prob.get_nodal_field(r.x, "shell_press_open", 0)[sn]
    amp = 0.5 * (P.max() - P.min())
    assert amp == pytest.approx(eps * np.exp(-lam * r.t), rel=0.03)


def test_two_layer_stack_conserves_and_equilibrates():
    """Two stacked layers with different initial saturations exchange via
    capillary-pressure difference: total liquid conserved, Pc equalizes."""
    mesh, bi = _shell(nx=4)
    H1, H2, p1, p2, G = 1.0, 2.0, 0.5, 0.25, 5.0
    mat = {"gap_1": H1, "porosity_1": p1, "diffusivity_1": 0.0,
           "gap_2": H2, "porosity_2": p2, "diffusivity_2": 0.0,
           "exchange_G": G,
           "pcap_1": lambda s: 1.0 - s, "pcap_2": lambda s: 1.0 - s}
    prob = Problem(
        mesh,
        [[], [PorousShellStackLayer(0, 2, interp="Q2"),
              PorousShellStackLayer(1, 2, interp="Q2")]],
        [{}, mat])
    prob.finalize()
    S1_0, S2_0 = 0.8, 0.2
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "shell_sat_1", 0, S1_0)
    x0 = prob.set_nodal_field(x0, "shell_sat_2", 0, S2_0)
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-12,
                            linear_solver="direct"),
        TimeOptions(dt0=0.05, t_end=5.0, adapt=False, theta=0.5))
    r = ts.run(x0, prob.base_params())
    assert all(s.converged for s in r.steps)
    sn = np.unique(mesh.blocks[bi].conn)
    S1 = prob.get_nodal_field(r.x, "shell_sat_1", 0)[sn].mean()
    S2 = prob.get_nodal_field(r.x, "shell_sat_2", 0)[sn].mean()
    # conservation of H*phi*S
    tot0 = H1 * p1 * S1_0 + H2 * p2 * S2_0
    tot = H1 * p1 * S1 + H2 * p2 * S2
    assert tot == pytest.approx(tot0, rel=1e-8)
    # capillary equilibration: same Pc => same S here
    assert S1 == pytest.approx(S2, abs=1e-3)


def test_closed_cell_lub_sink_numjac():
    """AD Jacobian of the coupled closed-cell + lubrication sink block is
    consistent with finite differences (the mm_numjac-style check)."""
    from goma_tpu.physics import LubPorousSink, ReynoldsFilm

    mesh, bi = _shell(nx=4)
    mat = dict(MAT_CLOSED)
    del mat["lub_pressure"]  # couple to the live lub field instead
    mat["gap"] = 0.3
    mat["mu_lub"] = 1.0
    prob = Problem(
        mesh,
        [[], [PorousShellClosed(interp="Q2"),
              ReynoldsFilm(interp="Q2", transient=False),
              LubPorousSink(interp="Q2")]],
        [{}, mat])
    prob.finalize()
    import jax

    rng = np.random.RandomState(0)
    x = np.zeros(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "shell_sat_closed", 0,
                             0.3 + 0.1 * rng.rand(mesh.n_nodes))
    x = prob.set_nodal_field(x, "lub_pressure", 0, 0.2 * rng.rand(mesh.n_nodes))
    x = jnp.asarray(x)
    params = prob.base_params()
    R0, vals = prob._assemble(x, params)
    # FD check of a few random columns
    import scipy.sparse as sp

    A = sp.csr_matrix((np.asarray(vals), prob.pattern.indices,
                       prob.pattern.indptr), shape=(prob.pattern.n,) * 2)
    h = 1e-6
    for j in rng.choice(prob.dofmap.n_dof, 6, replace=False):
        xp = x.at[j].add(h)
        R1, _ = prob._assemble(xp, params)
        fd = (np.asarray(R1) - np.asarray(R0)) / h
        np.testing.assert_allclose(A[:, j].toarray()[:, 0], fd,
                                   rtol=2e-4, atol=5e-6)
