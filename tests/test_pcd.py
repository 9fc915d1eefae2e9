"""PCD (pressure-convection-diffusion) Schur preconditioner
(reference src/sl_petsc_pcd.c parity)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _cavity(n=12, Re=100.0):
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    prob = Problem(
        mesh,
        [Momentum(2, transient=False), Continuity()],
        {"rho": 1.0, "mu": 1.0 / Re},
    )
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
    corner = np.where(
        np.isclose(mesh.coords[:, 0], 0.0) & np.isclose(mesh.coords[:, 1], 0.0)
    )[0]
    prob.mesh.nodesets["pin"] = corner
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    return prob


def test_pcd_preconditioned_cavity():
    prob = _cavity(12, Re=100.0)
    res = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-10, linear_solver="gmres",
                      precond="pcd", linear_tol=1e-8, gmres_restart=150,
                      linear_maxiter=600),
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    # cross-check against the direct solve
    ref = NewtonSolver(prob, NewtonOptions(max_iter=12, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    u_p = prob.get_nodal_field(res.x, "velocity", 0)
    u_d = prob.get_nodal_field(ref.x, "velocity", 0)
    np.testing.assert_allclose(u_p, u_d, atol=5e-8)


def test_pcd_apply_shapes_and_mass():
    """Fp with zero velocity and ct=0 equals Ap: y = Ap^-1 Ap Mp^-1 r + 2mu
    Mp^-1 r = 3mu...: verify the identity Fp(a)=Ap a on interior by the
    apply reducing to (1 + 2*mu*?) -- concretely: apply on a pressure-only
    residual reproduces Mp^-1-scaled result within the removed-row rule."""
    from goma_tpu.solvers.pcd import PCDFieldSplit

    prob = _cavity(6, Re=10.0)
    pcd = PCDFieldSplit(prob, mu=0.1, rho=1.0)
    params = prob.base_params()
    R, vals = prob.assemble(jnp.zeros(prob.dofmap.n_dof), params)
    fac = pcd.factor(vals, jnp.zeros(prob.dofmap.n_dof), 0.0)
    mv = lambda v: v  # placeholder operator for the triangular coupling
    r = jnp.asarray(np.random.RandomState(0).randn(prob.dofmap.n_dof))
    z = pcd.apply((*fac, mv), r)
    assert np.all(np.isfinite(np.asarray(z)))
    # with u=0, Fp == Ap, so the Schur part is Mp^-1 r_p + 2 mu Mp^-1 r_p on
    # non-removed dofs: check ratio on a probe vector supported on pressure
    pd = np.asarray(pcd.tables["pcd:pdofs"])
    rmask = np.asarray(pcd.tables["pcd:rmask"])
    rp_only = jnp.zeros(prob.dofmap.n_dof).at[jnp.asarray(pd)].set(1.0)
    z2 = np.asarray(pcd.apply((*fac, mv), rp_only))
    invmp = np.asarray(pcd.tables["pcd:invMp"])
    # u-block of rp_only is zero -> z_u = 0 -> r_p = rp_only
    interior = ~rmask
    got = z2[pd[interior]]
    # y = Ap^-1 Ap Mp^-1 1 + 2 mu Mp^-1 1 = (1 + 2 mu) Mp^-1 1 away from
    # removed rows (whose coupling perturbs only nearby entries)
    expect = (1.0 + 2 * 0.1) * invmp[interior]
    err = np.abs(got - expect) / np.abs(expect)
    assert np.median(err) < 1e-5
