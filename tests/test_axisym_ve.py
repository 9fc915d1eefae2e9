"""Axisymmetric viscoelastic hoop stress (the reference s33 polymer-stress
slot): pipe Poiseuille with Oldroyd-B keeps the Newtonian velocity profile
(viscometric flow), carries the exact S_zz = 2 lam mu_p (du/dr)^2 normal
stress, and S_tt = S_rr = 0."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (AxisymHoopStress, Continuity, Momentum,
                              VelocityGradientProjection, VEStress)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_axisym_ve_pipe_poiseuille():
    G, mu_s, mu_p, lam, R = 4.0, 0.5, 0.5, 0.2, 1.0
    mu_tot = mu_s + mu_p
    mesh = rectangle_mesh(3, 10, elem="QUAD9", xlim=(0, 1), ylim=(0, R))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False, convection=False,
                  ve_stress_modes=1, devss_mu=mu_p),
         Continuity(interp="Q1"),
         VEStress(0, dim=2, lam=lam, mu_p=mu_p, interp="Q2",
                  transient=False, supg=0.0),
         AxisymHoopStress(0, lam=lam, mu_p=mu_p, interp="Q2",
                          transient=False, supg=0.0),
         VelocityGradientProjection(dim=2, interp="Q1")],
        {"rho": 1.0, "mu": mu_s, "body_force": (G, 0.0)},
        coord="cylindrical")
    # viscometric flow imposed at inflow/outflow/wall (exact, Q2-representable);
    # axis (bottom, r=0) keeps the natural symmetry condition on u_z
    prof = lambda c: G * (R**2 - c[:, 1] ** 2) / (4 * mu_tot)
    for ns in ("top", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, prof)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    dm = prob.dofmap
    duz = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
    ok = duz >= 0
    r = mesh.coords[ok, 1]
    # Oldroyd-B pipe flow is viscometric: u_z = G (R^2 - r^2) / (4 mu_tot)
    np.testing.assert_allclose(res.x[duz[ok]],
                               G * (R**2 - r**2) / (4 * mu_tot), atol=1e-8)
    # gamma_dot = du_z/dr = -G r / (2 mu_tot); exact viscometric stresses
    d_s = dm.dof_of_node_svar[:, dm.svar("stress0", 0)]  # S_zz (comp 11)
    okS = d_s >= 0
    rS = mesh.coords[okS, 1]
    gd = -G * rS / (2 * mu_tot)
    np.testing.assert_allclose(res.x[d_s[okS]], 2 * lam * mu_p * gd**2,
                               atol=1e-6)
    d_tt = dm.dof_of_node_svar[:, dm.svar("stress0_tt")]
    np.testing.assert_allclose(res.x[d_tt[d_tt >= 0]], 0.0, atol=1e-8)
    d_rr = dm.dof_of_node_svar[:, dm.svar("stress0", 2)]  # S_rr (comp 22)
    np.testing.assert_allclose(res.x[d_rr[d_rr >= 0]], 0.0, atol=1e-7)


def test_axisym_ve_hoop_jacobian_fd():
    """FD check of the AD Jacobian through the hoop-stress coupling."""
    from goma_tpu.utils.numjac import numerical_jacobian_check

    mesh = rectangle_mesh(2, 3, elem="QUAD9", xlim=(0, 1), ylim=(0.2, 1.0))
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False, ve_stress_modes=1),
         Continuity(interp="Q1"),
         VEStress(0, dim=2, lam=0.3, mu_p=0.8, interp="Q1", transient=False),
         AxisymHoopStress(0, lam=0.3, mu_p=0.8, interp="Q1",
                          transient=False)],
        {"rho": 1.0, "mu": 0.5}, coord="cylindrical")
    prob.finalize()
    rng = np.random.RandomState(2)
    x = 0.2 * rng.randn(prob.dofmap.n_dof)
    rep = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=25)
    assert rep.ok, rep.report()
