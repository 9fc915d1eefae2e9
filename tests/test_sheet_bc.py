"""TENSION_SHEET / SHEET_ENDSLOPE web BCs.

Anchor: a clamped web under tension T with uniform transverse load p
satisfies T Y'' = -p => Y = p x (L - x) / (2 T), max deflection
p L^2 / (8 T) (sheet_tension, src/mm_ns_bc.c:4579; end term
src/bc_special.c:222).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from goma_tpu.bc.sheet import TensionSheet, add_sheet_end_slope
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import EllipticMesh
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _web_problem(T=2.0, p=0.4, nx=16, penalty=1e4, end_slope=None):
    mesh = rectangle_mesh(nx, 4, elem="QUAD9")
    prob = Problem(mesh, [EllipticMesh(2)],
                   {"lame_mu": 1e-3, "lame_lambda": 1e-3})
    # soft elastic mesh: the penalty membrane balance dominates on the web
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("top", "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("right", "mesh_displacement", 1, 0.0)
    prob.add_face_kernel("bottom", TensionSheet(
        2, tension=T, normal_comp=1, load=p, include_fluid_stress=False,
        penalty=penalty))
    if end_slope is not None:
        # idler-roll end slopes at both ends (natural end terms)
        mesh.nodesets["web_l"] = np.array(
            [np.argmin(mesh.coords[:, 0] + mesh.coords[:, 1])], np.int64)
        mesh.nodesets["web_r"] = np.array(
            [np.argmin(1 - mesh.coords[:, 0] + mesh.coords[:, 1])], np.int64)
        add_sheet_end_slope(prob, "web_l", T, end_slope, sign=-1.0)
        add_sheet_end_slope(prob, "web_r", T, -end_slope, sign=1.0)
    prob.finalize()
    return mesh, prob


def test_tension_sheet_parabola():
    T, p = 2.0, 0.4
    mesh, prob = _web_problem(T=T, p=p)
    solver = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-10, linear_solver="direct"))
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    dy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    web = mesh.nodesets["bottom"]
    xs = mesh.coords[web, 0]
    interior = (xs > 1e-9) & (xs < 1 - 1e-9)
    Yex = p * xs * (1.0 - xs) / (2.0 * T)
    # the kernel solves the NONLINEAR membrane (unit tangent of the
    # deformed web): the parabola is its small-slope limit, so allow the
    # O(h'^2/2) ~ 0.5% finite-slope correction (h'_max = p L / (2 T) = 0.1)
    np.testing.assert_allclose(dy[web][interior], Yex[interior],
                               rtol=1.2e-2, atol=1e-6)
    assert dy[web].max() == pytest.approx(p / (8 * T), rel=1.2e-2)


def test_tension_sheet_stiffer_web_deflects_less():
    _, prob1 = _web_problem(T=2.0)
    _, prob2 = _web_problem(T=8.0)
    opts = NewtonOptions(max_iter=10, tol_residual=1e-10,
                         linear_solver="direct")
    d1 = NewtonSolver(prob1, opts).solve(
        np.zeros(prob1.dofmap.n_dof), prob1.base_params())
    d2 = NewtonSolver(prob2, opts).solve(
        np.zeros(prob2.dofmap.n_dof), prob2.base_params())
    y1 = prob1.get_nodal_field(d1.x, "mesh_displacement", 1)
    y2 = prob2.get_nodal_field(d2.x, "mesh_displacement", 1)
    assert np.nanmax(y2) < 0.3 * np.nanmax(y1)


def test_sheet_end_slope_natural_term():
    """No load, left end pinned, SHEET_ENDSLOPE at the free right end:
    T Y'' = 0 with natural end term T Y'(L) = T slope0 => Y = slope0 * x."""
    T, s0 = 2.0, 0.05
    mesh = rectangle_mesh(8, 4, elem="QUAD9")
    prob = Problem(mesh, [EllipticMesh(2)], {})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("top", "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 1, 0.0)
    # EllipticMesh is an O(1) Laplacian: the strong (penalty) membrane
    # must dominate it, and the natural end term must scale with the SAME
    # penalty to stay consistent
    pen = 500.0
    prob.add_face_kernel("bottom", TensionSheet(
        2, tension=T, normal_comp=1, load=0.0,
        include_fluid_stress=False, penalty=pen))
    # free right end of the web, driven by the idler-roll slope
    web = mesh.nodesets["bottom"]
    xe = mesh.coords[web, 0]
    endnode = web[np.argmax(xe)]
    mesh.nodesets["web_r"] = np.array([endnode], dtype=np.int64)
    add_sheet_end_slope(prob, "web_r", pen * T, s0, sign=1.0)
    prob.finalize()
    solver = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-11, linear_solver="direct"))
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    dy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    # web follows Y = s0 * x up to the soft-mesh correction
    np.testing.assert_allclose(dy[web], s0 * mesh.coords[web, 0],
                               rtol=0.05, atol=2e-4)
