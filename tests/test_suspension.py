"""Suspension two-phase: q-tensor anisotropic migration and particle-phase
momentum (Buyevich drag)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    Continuity,
    Momentum,
    ParticleMomentum,
    ProjectionEquation,
    QTensorHydroSpecies,
    flow_frame_qtensor,
    particle_drag_force,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check


def test_qtensor_frame_properties():
    """Q is SPD with the prescribed eigenvalues in the flow frame, and blends
    to isotropic at stagnation points."""
    from goma_tpu.fem.fields import FieldVars

    fv = FieldVars()
    fv.x = jnp.zeros((3, 2))
    fv.val["velocity"] = jnp.array([[2.0, 0.0], [0.0, -3.0], [0.0, 0.0]])
    Q = np.asarray(flow_frame_qtensor(fv, (1.0, 0.5, 0.5)))
    # flow along x: Q = diag(1, 0.5); flow along -y: Q = diag(0.5, 1)
    np.testing.assert_allclose(Q[0], np.diag([1.0, 0.5]), atol=1e-9)
    np.testing.assert_allclose(Q[1], np.diag([0.5, 1.0]), atol=1e-9)
    np.testing.assert_allclose(Q[2], 0.75 * np.eye(2), atol=1e-9)


def test_qtensor_3d_vorticity_frame():
    from goma_tpu.fem.fields import FieldVars

    fv = FieldVars()
    fv.x = jnp.zeros((1, 3))
    # simple shear u = (y, 0, 0): flow = x, gradient = y, vorticity = -z
    fv.val["velocity"] = jnp.array([[1.0, 0.0, 0.0]])
    gu = np.zeros((1, 3, 3))
    gu[0, 0, 1] = 1.0
    fv.grad = {"velocity": jnp.asarray(gu)}
    Q = np.asarray(flow_frame_qtensor(fv, (1.0, 0.8, 0.5)))[0]
    np.testing.assert_allclose(Q, np.diag([1.0, 0.8, 0.5]), atol=1e-9)


def test_particle_settling_terminal_velocity():
    """Uniform suspension, still fluid (no fluid eqns): the steady particle
    momentum balance is beta (0 - v_p) + C drho g = 0 ->
    v_p = C drho g / beta."""
    C0, drho, g, mu_f, a = 0.2, 1.5, -2.0, 0.7, 0.05
    mesh = rectangle_mesh(3, 3, elem="QUAD4")
    pm = ParticleMomentum(2, interp="Q1", rho_p=2.0, mu_p=0.0, a_rad=a,
                          mu_f=mu_f, del_rho=drho, gravity=[0.0, g], C0=C0,
                          transient=False, convection=False)
    prob = Problem(mesh, [pm], {})
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-12,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    beta = 4.5 * mu_f * C0 / a**2
    vt = C0 * drho * g / beta
    vy = prob.get_nodal_field(res.x, "pvelocity", 1)
    vx = prob.get_nodal_field(res.x, "pvelocity", 0)
    np.testing.assert_allclose(vy, vt, rtol=1e-10)
    np.testing.assert_allclose(vx, 0.0, atol=1e-12)


def test_two_way_coupled_drag_jacobian():
    """Coupled fluid + particle momentum + qtensor migration: AD Jacobian
    matches FD on a randomized state."""
    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    pm = ParticleMomentum(2, interp="Q2", rho_p=2.0, mu_p=0.1, a_rad=0.1,
                          mu_f=1.0, del_rho=1.0, gravity=[0.0, -1.0],
                          C0=None, transient=False)

    def gd_src(fv, mat, params):
        from goma_tpu.physics.materials import shear_rate

        return shear_rate(fv)[:, None]

    eqs = [
        Momentum(2, transient=False),
        Continuity(),
        pm,
        QTensorHydroSpecies(Kc=0.4, Kmu=0.6, convection=False, transient=False),
        ProjectionEquation("shear_rate", 1, gd_src, interp="Q1"),
    ]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0,
                               "body_force": particle_drag_force(pm)})
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.finalize()
    rng = np.random.RandomState(1)
    x = 0.05 * rng.randn(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "species", 0, 0.3 + 0.05 * rng.rand(mesh.n_nodes))
    x = prob.set_nodal_field(x, "shear_rate", 0, 0.5 + rng.rand(mesh.n_nodes))
    chk = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=10,
                                   h=1e-6)
    assert chk.ok, chk.report()
