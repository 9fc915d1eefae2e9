"""Axisymmetric (CYLINDRICAL/SWIRLING) coordinates, q = [z, r].

Reference: load_coordinate_scales (src/mm_fill_aux.c:127) + the curvature
terms of assemble_momentum/continuity. Validation against exact solutions:

* pipe Poiseuille  u_z = G (R^2 - r^2) / 4 mu      (exact in Q2)
* circular Couette w = A r + B / r                  (h-convergent)
* annulus conduction T = ln(r/R1) / ln(R2/R1)
* uniform radial dilation of the elastic mesh equation (exact)
* r-weighted volume/side integrals
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum, SwirlMomentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_axisym_pipe_poiseuille_exact():
    G, mu, R = 4.0, 0.5, 1.0
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 1), ylim=(0, R))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False),
         Continuity(interp="Q1")],
        {"rho": 1.0, "mu": mu, "body_force": (G, 0.0)},
        coord="cylindrical",
    )
    prob.add_dirichlet("top", "velocity", 0, 0.0)      # wall r = R: u_z = 0
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)     # u_r = 0 (axis+walls)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dm = prob.dofmap
    duz = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
    ok = duz >= 0
    r = mesh.coords[ok, 1]
    exact = G * (R**2 - r**2) / (4.0 * mu)
    np.testing.assert_allclose(res.x[duz[ok]], exact, atol=1e-9)
    dur = dm.dof_of_node_svar[:, dm.svar("velocity", 1)]
    np.testing.assert_allclose(res.x[dur[dur >= 0]], 0.0, atol=1e-9)


def test_swirl_circular_couette():
    R1, R2, W1, W2 = 1.0, 2.0, 3.0, 0.5
    mesh = rectangle_mesh(2, 24, elem="QUAD9", xlim=(0, 0.2), ylim=(R1, R2))
    prob = Problem(mesh, [SwirlMomentum(interp="Q2", transient=False)],
                   {"rho": 1.0, "mu": 1.0}, coord="swirling")
    prob.add_dirichlet("bottom", "swirl", 0, W1)  # r = R1
    prob.add_dirichlet("top", "swirl", 0, W2)     # r = R2
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    # w = A r + B/r through (R1, W1), (R2, W2)
    A = (W2 * R2 - W1 * R1) / (R2**2 - R1**2)
    B = (W1 - A * R1) * R1
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("swirl")]
    ok = d >= 0
    r = mesh.coords[ok, 1]
    np.testing.assert_allclose(res.x[d[ok]], A * r + B / r, rtol=2e-5)


def test_axisym_annulus_conduction():
    R1, R2 = 1.0, 2.0
    mesh = rectangle_mesh(2, 16, elem="QUAD9", xlim=(0, 0.3), ylim=(R1, R2))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 2.0},
                   coord="cylindrical")
    prob.add_dirichlet("bottom", "temperature", 0, 0.0)
    prob.add_dirichlet("top", "temperature", 0, 1.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("temperature")]
    ok = d >= 0
    r = mesh.coords[ok, 1]
    np.testing.assert_allclose(res.x[d[ok]], np.log(r / R1) / np.log(R2 / R1),
                               atol=5e-6)


def test_axisym_volume_and_side_integrals():
    from goma_tpu.post.postproc import sideset_integral, volume_integral

    mesh = rectangle_mesh(4, 4, elem="QUAD9", xlim=(0, 1), ylim=(0, 1))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 1.0},
                   coord="cylindrical")
    prob.finalize()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    params = prob.base_params()
    vol = volume_integral(prob, lambda fv, mat, p: jnp.ones_like(fv.detJ))
    # per-radian volume of the unit cylinder: int r dr dz = 1/2
    np.testing.assert_allclose(float(vol(x, params)), 0.5, rtol=1e-12)
    area = sideset_integral(prob, "top",
                            lambda sfv, mat, p: jnp.ones_like(sfv.detJ))
    # lateral surface r = 1, length 1: per-radian area = r * L = 1
    np.testing.assert_allclose(float(area(x, params)), 1.0, rtol=1e-12)
    axis = sideset_integral(prob, "bottom",
                            lambda sfv, mat, p: jnp.ones_like(sfv.detJ))
    # the axis r = 0 has zero area
    np.testing.assert_allclose(float(axis(x, params)), 0.0, atol=1e-14)


def test_axisym_elastic_mesh_dilation_exact():
    """Uniform radial dilation d_r = alpha r, d_z = 0 is an exact solution
    of axisymmetric linear elasticity (eps_rr = eps_tt = alpha, constant
    stress): imposing it on the boundary must reproduce it in the interior.
    Without the hoop strain terms the interior solution is NOT alpha*r."""
    from goma_tpu.physics.mesh_motion import LinearElasticMesh

    alpha = 0.1
    mesh = rectangle_mesh(5, 5, elem="QUAD9", xlim=(0, 1), ylim=(0.5, 1.5))
    prob = Problem(mesh, [LinearElasticMesh(dim=2, interp="Q2")],
                   {"mesh_shear_modulus": 1.0, "mesh_lambda": 2.0},
                   coord="cylindrical")
    from goma_tpu.fem.fields import MESH_VAR

    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, MESH_VAR, 0, 0.0)
        prob.add_dirichlet(ns, MESH_VAR, 1,
                           lambda X: alpha * X[:, 1])
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 1)]
    ok = d >= 0
    np.testing.assert_allclose(res.x[d[ok]], alpha * mesh.coords[ok, 1],
                               atol=1e-10)


def test_axisym_jacobian_consistency():
    """AD Jacobian vs finite differences on the axisym NS + swirl residual
    (the mm_numjac check for the new curvature terms)."""
    mesh = rectangle_mesh(3, 3, elem="QUAD9", xlim=(0, 1), ylim=(0.3, 1.3))
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False),
         SwirlMomentum(interp="Q2", transient=False),
         Continuity(interp="Q1")],
        {"rho": 1.2, "mu": 0.7}, coord="swirling")
    prob.finalize()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(prob.dofmap.n_dof) * 0.3)
    params = prob.base_params()
    from goma_tpu.utils.numjac import numerical_jacobian_check

    rep = numerical_jacobian_check(prob, np.asarray(x), params, n_columns=25)
    assert rep.ok, rep.report()
