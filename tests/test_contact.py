"""Rigid-obstacle penalty contact (bc_contact.c capability subset)."""

import numpy as np

from goma_tpu.bc.contact import RigidContactPenalty, halfspace
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import RealSolid, SolidTraction
from goma_tpu.solvers import NewtonOptions, NewtonSolver

MU, LAM = 3.0, 2.0


def test_column_pressed_onto_floor():
    """Constrained column (d_x = 0) pressed down by traction T with its base
    resting on the rigid floor y = 0. Penalty contact supports the load:
    penetration = T/k, uniaxial compression above."""
    T, k = 0.4, 5e3
    mesh = rectangle_mesh(3, 6, elem="QUAD9")
    prob = Problem(mesh, [RealSolid(2, interp="Q2", model="linear")],
                   {"lame_mu": MU, "lame_lambda": LAM})
    prob.mesh.nodesets["all"] = np.arange(mesh.n_nodes)
    prob.add_dirichlet("all", "solid_displacement", 0, 0.0)
    prob.add_face_kernel("top", SolidTraction(2, [0.0, -T]))
    prob.add_face_kernel("bottom", RigidContactPenalty(
        2, halfspace([0.0, 1.0], 0.0), k))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=25, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    dy = prob.get_nodal_field(res.x, "solid_displacement", 1)
    y = mesh.coords[:, 1]
    pen = T / k
    eps = T / (LAM + 2 * MU)  # constrained (oedometric) compression
    # sigma_yy = -T throughout: base penetrates pen = T/k, column compresses
    # linearly above it
    expect = -pen - eps * y
    np.testing.assert_allclose(dy, expect, atol=1e-6)
    # total support force equals the applied load (per unit width)
    bottom = mesh.nodesets["bottom"]
    assert abs(dy[bottom].mean() + pen) < 1e-8


def test_no_contact_when_separated():
    """Pull the column UP: the floor exerts nothing; pure free stretch."""
    T, k = 0.4, 5e3
    mesh = rectangle_mesh(2, 4, elem="QUAD9")
    prob = Problem(mesh, [RealSolid(2, interp="Q2", model="linear")],
                   {"lame_mu": MU, "lame_lambda": LAM})
    prob.mesh.nodesets["all"] = np.arange(mesh.n_nodes)
    prob.add_dirichlet("all", "solid_displacement", 0, 0.0)
    prob.add_dirichlet("bottom", "solid_displacement", 1, 0.0)
    prob.add_face_kernel("top", SolidTraction(2, [0.0, +T]))
    # obstacle 0.05 below: never touched
    prob.add_face_kernel("bottom", RigidContactPenalty(
        2, halfspace([0.0, 1.0], -0.05), k))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dy = prob.get_nodal_field(res.x, "solid_displacement", 1)
    eps = T / (LAM + 2 * MU)
    np.testing.assert_allclose(dy, eps * mesh.coords[:, 1], atol=1e-9)
