"""Level-set tests: advection of a circular interface in rigid rotation with
periodic renormalization; Heaviside/delta properties; exact-distance renorm."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import FillEquation, heaviside, delta, renormalize
from goma_tpu.physics.level_set import interface_facets
from goma_tpu.solvers import NewtonOptions
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def test_heaviside_delta_properties():
    eps = 0.1
    F = jnp.linspace(-0.5, 0.5, 2001)
    H = heaviside(F, eps)
    d = delta(F, eps)
    assert float(H[0]) == 0.0 and float(H[-1]) == 1.0
    np.testing.assert_allclose(float(H[1000]), 0.5, atol=1e-12)
    # delta integrates to 1
    np.testing.assert_allclose(np.trapezoid(np.asarray(d), np.asarray(F)), 1.0, atol=1e-4)
    # delta = dH/dF
    fd = np.gradient(np.asarray(H), np.asarray(F))
    np.testing.assert_allclose(np.asarray(d)[100:-100], fd[100:-100], atol=1e-2)


def test_renormalize_exact_distance():
    mesh = rectangle_mesh(20, 20, elem="QUAD4", xlim=(-1, 1), ylim=(-1, 1))
    r0 = 0.5
    d_exact = np.linalg.norm(mesh.coords, axis=1) - r0
    # distorted field with the same zero contour
    F = np.tanh(3 * d_exact) * (1.3 + 0.5 * mesh.coords[:, 0])
    Fr = renormalize(mesh, F)
    near = np.abs(d_exact) < 0.3
    np.testing.assert_allclose(Fr[near], d_exact[near], atol=0.02)


def test_rotating_interface():
    """Circle advected by rigid rotation: after angle phi the zero-contour
    centroid rotates by phi; signed-distance property maintained by renorm."""
    mesh = rectangle_mesh(16, 16, elem="QUAD4", xlim=(-1, 1), ylim=(-1, 1))
    prob = Problem(mesh, [FillEquation(interp="Q1", supg=0.5)], {})
    prob.finalize()

    # prescribed rotation field via a frozen velocity variable is not active;
    # instead bake u into the kernel through params-free closure: use a
    # Dirichlet-frozen velocity field -> simplest: add velocity var with all
    # nodes Dirichlet is wasteful; here we monkey-patch advective velocity by
    # a body-fixed rotation through material closure:
    import goma_tpu.physics.level_set as ls

    class RotatingFill(FillEquation):
        def residual(self, fv, mat, params):
            gF = fv.grad[ls.FILL_VAR][:, 0, :]
            x, y = fv.x[:, 0], fv.x[:, 1]
            u = jnp.stack([-y, x], axis=1)
            r = fv.dot[ls.FILL_VAR][:, 0] + jnp.einsum("qk,qk->q", u, gF)
            phi = fv.phi[ls.FILL_VAR]
            gphi = fv.gphi[ls.FILL_VAR]
            u2 = jnp.sum(u * u, axis=1)
            tau = 0.5 * fv.h_elem * jnp.sqrt(u2 + 1e-30) / (2.0 * u2 + 1e-12)
            w = phi + tau[:, None] * jnp.einsum("qk,qik->qi", u, gphi)
            return jnp.einsum("q,qi->qi", r, w)[:, None, :]

    prob = Problem(mesh, [RotatingFill(interp="Q1", supg=0.5)], {})
    prob.finalize()

    c0 = np.array([0.4, 0.0])
    r0 = 0.25
    F0 = np.linalg.norm(mesh.coords - c0, axis=1) - r0
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0, F0)

    phi_total = np.pi / 2
    state = {"x": x0}

    def renorm_cb(t, x, xdot, res):
        F = prob.get_nodal_field(x, "fill")
        Fr = renormalize(mesh, F)
        state["x"] = prob.set_nodal_field(x, "fill", 0, Fr)

    # integrate in windows, renormalizing between windows
    x = x0
    nsub = 4
    for k in range(nsub):
        ts = TransientSolver(
            prob,
            NewtonOptions(max_iter=5, tol_residual=1e-10, linear_tol=1e-11),
            TimeOptions(dt0=phi_total / 40, t_end=(k + 1) * phi_total / nsub,
                        adapt=False, theta=0.5),
        )
        res = ts.run(x, prob.base_params(), t0=k * phi_total / nsub)
        x = res.x
        F = prob.get_nodal_field(x, "fill")
        x = prob.set_nodal_field(x, "fill", 0, renormalize(mesh, F))

    F = prob.get_nodal_field(x, "fill")
    segs = interface_facets(mesh, F)
    centroid = segs.mean(axis=(0, 1))
    expect = np.array([0.0, 0.4])  # quarter turn of (0.4, 0)
    np.testing.assert_allclose(centroid, expect, atol=0.04)
    # radius preserved
    rads = np.linalg.norm(segs.reshape(-1, 2) - centroid, axis=1)
    np.testing.assert_allclose(rads.mean(), r0, atol=0.03)


def test_ls_curvature_circle():
    """LSCurvature (assemble_curvature parity): distance to a circle
    centered OUTSIDE the domain (field smooth everywhere inside) gives
    kappa = 1/r; interior nodes checked (the dropped wall boundary term
    biases only wall-adjacent rows)."""
    from goma_tpu.fem.equations import Equation
    from goma_tpu.physics.level_set import (FILL_VAR, LSCurvature,
                                            LSCurvatureBoundary)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    class FrozenFill(Equation):
        def __init__(self):
            super().__init__(FILL_VAR, 1, "Q2")

        def residual(self, fv, mat, params):
            z = 0.0 * fv.val[FILL_VAR][:, :, None]
            return z * fv.phi[FILL_VAR][:, None, :]

    cx, cy, R = -0.2, 0.5, 0.5
    mesh = rectangle_mesh(16, 16, elem="QUAD9")
    prob = Problem(mesh, [FrozenFill(), LSCurvature(interp="Q2")], {})
    dist = lambda c: np.sqrt((c[:, 0] - cx) ** 2 + (c[:, 1] - cy) ** 2) - R
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    prob.add_dirichlet("all", FILL_VAR, 0, dist)
    for ss in ("left", "right", "top", "bottom"):
        prob.add_face_kernel(ss, LSCurvatureBoundary())
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), FILL_VAR, 0, dist)
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    kap = prob.get_nodal_field(res.x, "ls_curvature", 0)
    xy = mesh.coords
    r = np.sqrt((xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2)
    rel = np.abs(kap * r - 1.0)
    assert np.percentile(rel, 90) < 0.03, np.percentile(rel, 90)
    assert rel.max() < 0.12, rel.max()  # corner quadrature error only
