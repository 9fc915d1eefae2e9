"""Viscoelastic stress validation against analytic simple-shear solutions.

Oldroyd-B steady simple shear (rate gd): S12 = mu_p*gd, S11 = 2*lam*mu_p*gd^2,
S22 = 0. Giesekus steady shear has shear-thinning closed form; we check the
qualitative property |S12_giesekus| < |S12_oldroyd| and N1 > 0.
Reference: ``src/mm_fill_stress.c`` (EVSS-F assemble_stress_fortin).
"""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    Continuity,
    Momentum,
    VelocityGradientProjection,
    VEStress,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def couette_ve(model="oldroyd_b", lam=0.5, mu_p=1.0, mu_s=0.5, alpha=0.0, V=1.0, n=4):
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [
        Momentum(dim=2, interp="Q2", transient=False, ve_stress_modes=1, devss_mu=mu_p),
        Continuity(interp="Q1"),
        VEStress(0, dim=2, lam=lam, mu_p=mu_p, model=model, alpha=alpha,
                 interp="Q1", transient=False),
        VelocityGradientProjection(dim=2, interp="Q1"),
    ]
    mat = {"rho": 0.0, "mu": mu_s}
    prob = Problem(mesh, eqs, mat)
    # Couette: u = (V*y, 0) imposed on all walls (consistent with exact soln)
    shear = lambda c: V * c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, shear)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=15, tol_residual=1e-10, linear_tol=1e-11,
                      gmres_restart=100, linear_maxiter=3000),
    )
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    return prob, res


def test_oldroyd_b_simple_shear():
    lam, mu_p, V = 0.5, 1.0, 1.0
    prob, res = couette_ve(model="oldroyd_b", lam=lam, mu_p=mu_p, V=V)
    assert res.converged, res.summary()
    s11 = prob.get_nodal_field(res.x, "stress0", 0)
    s12 = prob.get_nodal_field(res.x, "stress0", 1)
    s22 = prob.get_nodal_field(res.x, "stress0", 2)
    gd = V  # du/dy
    np.testing.assert_allclose(np.nanmean(s12), mu_p * gd, rtol=1e-6)
    np.testing.assert_allclose(np.nanmean(s11), 2 * lam * mu_p * gd**2, rtol=1e-6)
    assert np.nanmax(np.abs(s22)) < 1e-6
    # uniform fields
    assert np.nanstd(s11) < 1e-6
    # quadratic Newton convergence (nonlinear constitutive coupling)
    assert res.iters <= 8


def test_giesekus_shear_thinning():
    lam, mu_p, V = 0.5, 1.0, 2.0
    _, res_ob = couette_ve(model="oldroyd_b", lam=lam, mu_p=mu_p, V=V)
    prob_g, res_g = couette_ve(model="giesekus", lam=lam, mu_p=mu_p, alpha=0.3, V=V)
    assert res_g.converged, res_g.summary()
    s12_g = np.nanmean(prob_g.get_nodal_field(res_g.x, "stress0", 1))
    s11_g = np.nanmean(prob_g.get_nodal_field(res_g.x, "stress0", 0))
    s22_g = np.nanmean(prob_g.get_nodal_field(res_g.x, "stress0", 2))
    assert 0 < s12_g < mu_p * V  # shear thinning
    assert s11_g - s22_g > 0  # positive N1
    # Giesekus steady shear satisfies the algebraic system; verify residual
    # identity for the 12-component: S12 + lam*(-gd*S22... ) cross-check via
    # the known relation N2 < 0 for alpha > 0
    assert s22_g < 0


def test_ptt_eps_thinning():
    lam, mu_p, V = 0.5, 1.0, 2.0

    def run(eps):
        mesh = rectangle_mesh(4, 4, elem="QUAD9")
        mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
        eqs = [
            Momentum(dim=2, interp="Q2", transient=False, ve_stress_modes=1, devss_mu=mu_p),
            Continuity(interp="Q1"),
            VEStress(0, dim=2, lam=lam, mu_p=mu_p, model="ptt", eps_ptt=eps,
                     interp="Q1", transient=False),
            VelocityGradientProjection(dim=2, interp="Q1"),
        ]
        prob = Problem(mesh, eqs, {"rho": 0.0, "mu": 0.5})
        shear = lambda c: V * c[:, 1]
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, "velocity", 0, shear)
            prob.add_dirichlet(ns, "velocity", 1, 0.0)
        prob.add_dirichlet("pin", "pressure", 0, 0.0)
        prob.finalize()
        x0 = prob.set_nodal_field(
            np.zeros(prob.dofmap.n_dof), "velocity", 0, lambda c: V * c[:, 1]
        )
        x0 = prob.set_nodal_field(x0, "stress0", 1, mu_p * V)
        res = NewtonSolver(
            prob, NewtonOptions(max_iter=20, tol_residual=1e-10, linear_solver="direct")
        ).solve(x0, prob.base_params())
        assert res.converged, res.summary()
        return np.nanmean(prob.get_nodal_field(res.x, "stress0", 1))

    s0 = run(0.0)
    s1 = run(0.2)
    np.testing.assert_allclose(s0, 1.0 * V, rtol=1e-6)  # Oldroyd-B limit
    assert s1 < s0  # PTT thins


def test_logconf_simple_shear():
    """Log-conformation formulation reproduces the Oldroyd-B analytic simple
    shear: Psi = log(c) with c = [[1+2(lam gd)^2, lam gd], [lam gd, 1]],
    stress s12 = mu_p gd, s11 = 2 lam mu_p gd^2.
    Reference: assemble_stress_log_conf (src/mm_fill_stress.c:2600)."""
    import jax.numpy as jnp
    from goma_tpu.physics import LogConformationStress
    from goma_tpu.physics.viscoelastic import logconf_stress_tensor, _eig2_sym

    lam, mu_p, mu_s, V = 0.5, 1.0, 0.5, 1.0
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [
        Momentum(dim=2, interp="Q2", transient=False,
                 logconf_modes=((0, lam, mu_p),), devss_mu=mu_p),
        Continuity(interp="Q1"),
        LogConformationStress(0, lam=lam, mu_p=mu_p, interp="Q1", transient=False),
        VelocityGradientProjection(dim=2, interp="Q1"),
    ]
    prob = Problem(mesh, eqs, {"rho": 0.0, "mu": mu_s})
    shear = lambda c: V * c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, shear)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    # initialize Psi with the analytic log-conformation
    gd = V
    c_exact = np.array([[1 + 2 * (lam * gd) ** 2, lam * gd], [lam * gd, 1.0]])
    wec, vec = np.linalg.eigh(c_exact)
    Psi_exact = vec @ np.diag(np.log(wec)) @ vec.T
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "velocity", 0, shear)
    for comp, (a, b) in enumerate([(0, 0), (0, 1), (1, 1)]):
        x0 = prob.set_nodal_field(x0, f"logconf0", comp, Psi_exact[a, b])
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=20, tol_residual=1e-10, linear_solver="direct")
    ).solve(x0, prob.base_params())
    assert res.converged, res.summary()
    p11 = np.nanmean(prob.get_nodal_field(res.x, "logconf0", 0))
    p12 = np.nanmean(prob.get_nodal_field(res.x, "logconf0", 1))
    p22 = np.nanmean(prob.get_nodal_field(res.x, "logconf0", 2))
    np.testing.assert_allclose([p11, p12, p22],
                               [Psi_exact[0, 0], Psi_exact[0, 1], Psi_exact[1, 1]],
                               atol=1e-7)
    # recovered stresses
    tau_exact = mu_p / lam * (c_exact - np.eye(2))
    Psi = np.array([[p11, p12], [p12, p22]])
    wv, vv = np.linalg.eigh(Psi)
    c = vv @ np.diag(np.exp(wv)) @ vv.T
    tau = mu_p / lam * (c - np.eye(2))
    np.testing.assert_allclose(tau, tau_exact, atol=1e-6)


def test_sqrt_conformation_simple_shear():
    """SQRT_CONF parity (assemble_stress_sqrt_conf): steady simple shear,
    exact Oldroyd-B conformation c = [[1+2W^2, W], [W, 1]], W = lam*gd; the
    recovered stress mu_p/lam (b b^T - I) must match the analytic tau."""
    from goma_tpu.physics import SqrtConformationStress
    from goma_tpu.physics.viscoelastic import _sym_expand

    lam, mu_p, mu_s, V = 0.5, 1.0, 0.5, 1.0
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [
        Momentum(dim=2, interp="Q2", transient=False,
                 sqrtconf_modes=((0, lam, mu_p),)),
        Continuity(interp="Q1"),
        SqrtConformationStress(0, lam=lam, mu_p=mu_p, interp="Q1",
                               transient=False),
    ]
    prob = Problem(mesh, eqs, {"rho": 0.0, "mu": mu_s})
    shear = lambda c: V * c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, shear)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    # b must start at the identity (b = 0 is singular through b^{-1})
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "bconf0", 0, 1.0)
    x0 = prob.set_nodal_field(x0, "bconf0", 2, 1.0)
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=20, tol_residual=1e-10,
                            linear_solver="direct")
    ).solve(x0, prob.base_params())
    assert res.converged, res.summary()

    b11 = prob.get_nodal_field(res.x, "bconf0", 0)
    b12 = prob.get_nodal_field(res.x, "bconf0", 1)
    b22 = prob.get_nodal_field(res.x, "bconf0", 2)
    mask = ~np.isnan(b11)
    B = np.zeros((mask.sum(), 2, 2))
    B[:, 0, 0], B[:, 0, 1] = b11[mask], b12[mask]
    B[:, 1, 0], B[:, 1, 1] = b12[mask], b22[mask]
    c = np.einsum("qik,qjk->qij", B, B)
    W = lam * V
    c_exact = np.array([[1 + 2 * W**2, W], [W, 1.0]])
    np.testing.assert_allclose(c, np.broadcast_to(c_exact, c.shape), atol=1e-7)
    # recovered polymer stress
    tau = mu_p / lam * (c - np.eye(2))
    np.testing.assert_allclose(tau[:, 0, 1], mu_p * V, atol=1e-7)
    np.testing.assert_allclose(tau[:, 0, 0], 2 * lam * mu_p * V**2, atol=1e-6)


def test_dg_stress_advection_decay():
    """Discontinuous (P1E) stress with interior-face upwinding
    (assemble_surface_stress / J_stress_neighbor parity): uniform flow
    relaxes the inflow stress exponentially, s(x) = s_in exp(-x/(U lam))."""
    from goma_tpu.mesh.interface import interior_face_pairs
    from goma_tpu.physics.viscoelastic import DGStressInflow, DGStressUpwind

    U, lam, mu_p, L = 1.0, 0.5, 1.0, 2.0
    nx = 16
    mesh = rectangle_mesh(nx, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.25))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    s_in = np.array([1.0, 0.5, 0.25])
    eqs = [
        Momentum(dim=2, interp="Q2", transient=False),
        Continuity(interp="Q1"),
        VEStress(0, dim=2, lam=lam, mu_p=mu_p, interp="P1E", supg=0.0,
                 use_projected_gradient=False, transient=False),
    ]
    prob = Problem(mesh, eqs, {"rho": 0.0, "mu": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, U)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_interface_kernel(interior_face_pairs(mesh, 0),
                              DGStressUpwind(0, lam=lam))
    prob.add_face_kernel("left", DGStressInflow(0, lam=lam, s_in=s_in))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    bd = prob.dofmap.blocks[0]
    s = bd.slot("stress0")
    # P1E basis [1, xi, eta]: dof 0 is the element-centroid value
    vals = res.x[bd.gather[:, s.start]]  # stress0 comp 0, per element
    xc = mesh.coords[mesh.blocks[0].conn].mean(axis=1)[:, 0]
    # the DG solution is exact in the cell-averaged transfer sense; fit the
    # decay rate and check the inflow amplitude
    order = np.argsort(xc)
    rate = np.polyfit(xc[order], np.log(vals[order]), 1)[0]
    np.testing.assert_allclose(rate, -1.0 / (U * lam), rtol=0.02)
    exact = s_in[0] * np.exp(-xc / (U * lam))
    np.testing.assert_allclose(vals, exact, rtol=0.08)
    # all three components decay with the same profile scaling
    v12 = res.x[bd.gather[:, s.start + s.nbf]]
    np.testing.assert_allclose(v12 / vals, s_in[1] / s_in[0], rtol=1e-6)
