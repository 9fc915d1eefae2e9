"""Rotated-BC tests: a lid-driven cavity tilted by 30 degrees, with all BCs
expressed as rotated normal/tangent constraints, must reproduce the
axis-aligned cavity solution rotated — exercising genuinely non-axis-aligned
frames, constraint rows, and rotated equation rows."""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def solve_axis_cavity(n=6, Re=50.0):
    from tests.test_cavity import cavity_problem

    mesh, prob = cavity_problem(n=n, Re=Re)
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    return mesh, prob, res


def test_tilted_cavity_matches_axis_aligned():
    n, Re, theta = 6, 50.0, np.pi / 6
    mesh_a, prob_a, res_a = solve_axis_cavity(n, Re)

    c, s = np.cos(theta), np.sin(theta)
    Rot = np.array([[c, -s], [s, c]])

    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.coords = mesh.coords @ Rot.T
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0 / Re})
    # walls registered FIRST: corners shared with the lid get the wall value
    # (first spec wins per the mm_bc_conflict.c dup rule, matching the
    # axis-aligned deck's ordering)
    for d in ("normal", "tangent"):
        prob.add_rotated_dirichlet(("left", "right", "bottom"), "velocity", d, 0.0)
    # lid: u.n = 0, u.t = -1 (frame tangent t = (-n_y, n_x); lid normal is
    # Rot @ (0,1), so the lid velocity Rot @ (1,0) has u.t = -1)
    prob.add_rotated_dirichlet(("top",), "velocity", "normal", 0.0)
    prob.add_rotated_dirichlet(("top",), "velocity", "tangent", -1.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    # Newton iteration parity with the axis-aligned solve
    assert res.iters == res_a.iters

    ua_x = prob_a.get_nodal_field(res_a.x, "velocity", 0)
    ua_y = prob_a.get_nodal_field(res_a.x, "velocity", 1)
    ut_x = prob.get_nodal_field(res.x, "velocity", 0)
    ut_y = prob.get_nodal_field(res.x, "velocity", 1)
    # rotate the axis-aligned solution into the tilted frame and compare
    expect = (Rot @ np.stack([ua_x, ua_y])).T
    got = np.stack([ut_x, ut_y], axis=1)
    np.testing.assert_allclose(got, expect, atol=1e-8)
    # pressure identical
    pa = prob_a.get_nodal_field(res_a.x, "pressure")
    pt = prob.get_nodal_field(res.x, "pressure")
    ok = ~np.isnan(pa)
    np.testing.assert_allclose(pt[ok], pa[ok], atol=1e-7)


def test_slip_wall_channel():
    """Body-force-driven flow between a no-slip bottom and a free-slip top
    (rotated normal-only constraint): analytic u(y) = G/mu (H y - y^2/2)."""
    G, mu, H = 1.0, 0.5, 1.0
    mesh = rectangle_mesh(4, 6, elem="QUAD9", xlim=(0, 0.5), ylim=(0, H))
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False, convection=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": mu, "body_force": np.array([G, 0.0])})
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    prob.add_dirichlet("bottom", "velocity", 1, 0.0)
    # periodic-ish ends: prescribe the analytic profile
    uex = lambda c: G / mu * (H * c[:, 1] - 0.5 * c[:, 1] ** 2)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uex)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    # free-slip top: u.n = 0 only; tangential momentum equation retained
    prob.add_rotated_dirichlet(("top",), "velocity", "normal", 0.0)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    np.testing.assert_allclose(u, uex(mesh.coords), atol=1e-9)
    # max velocity at the slip wall (zero shear there)
    top = mesh.nodesets["top"]
    np.testing.assert_allclose(u[top], G / mu * H**2 / 2, atol=1e-9)
