"""Pointwise collocated constraints (bc_colloc parity): mesh nodes pinned to
analytic surfaces; hunting sweeps; fold detection on the Bratu arc."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.bc.pointwise import plane, surface
from goma_tpu.continuation import HuntSpec, detect_folds, hunt_problem, arclength_continue
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import EllipticMesh, Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_mesh_nodes_slide_on_plane():
    """Bottom boundary constrained to the tilted plane y = 0.2 x; the mesh
    equation's tangential component lets nodes slide along it."""
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [EllipticMesh(2)], {})
    # top fixed, sides: x-displacement fixed (slide vertically)
    prob.add_dirichlet("top", "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("top", "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("right", "mesh_displacement", 0, 0.0)
    # bottom: y-equation replaced by plane constraint n.(X0+d) = 0 with
    # n = (-0.2, 1): y = 0.2 x
    prob.add_point_constraint("bottom", "mesh_displacement", 1,
                              plane([-0.2, 1.0], 0.0))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    dx = prob.get_nodal_field(res.x, "mesh_displacement", 0)
    dy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0] + dx[bot]
    yb = mesh.coords[bot, 1] + dy[bot]
    np.testing.assert_allclose(yb, 0.2 * xb, atol=1e-10)
    # interior stayed untangled
    from goma_tpu.post.quality import element_quality

    assert element_quality(prob, res.x).ok


def test_mesh_nodes_on_curved_surface():
    """GEOM-style constraint: bottom nodes on the parabola y = 0.1 x(1-x)."""
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [EllipticMesh(2)], {})
    prob.add_dirichlet("top", "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("top", "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("right", "mesh_displacement", 0, 0.0)
    prob.add_point_constraint(
        "bottom", "mesh_displacement", 1,
        surface(lambda x: x[1] - 0.1 * x[0] * (1 - x[0])),
    )
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    dx = prob.get_nodal_field(res.x, "mesh_displacement", 0)
    dy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0] + dx[bot]
    yb = mesh.coords[bot, 1] + dy[bot]
    np.testing.assert_allclose(yb, 0.1 * xb * (1 - xb), atol=1e-10)


def test_hunting_and_folds():
    from tests.test_continuation import bratu_problem

    mesh, prob = bratu_problem(5)
    steps = hunt_problem(
        prob,
        [HuntSpec("lam", 0.5, 5.0)],
        np.zeros(prob.dofmap.n_dof),
        ds0=0.3,
        newton_options=NewtonOptions(max_iter=10, tol_residual=1e-10,
                                     linear_solver="direct"),
    )
    assert steps[-1].lam == pytest.approx(1.0)  # s in [0,1]
    assert all(s.converged for s in steps)

    def make_params(lam):
        return prob.base_params(lam=jnp.asarray(lam, dtype=prob.dtype))

    arc = arclength_continue(
        prob, make_params, 5.0, steps[-1].x, ds0=1.0, n_steps=22,
        newton_options=NewtonOptions(max_iter=12, tol_residual=1e-9,
                                     linear_solver="direct"),
        lam_scale=5.0,
    )
    folds = detect_folds(arc)
    assert len(folds) >= 1
    lam_fold = arc[folds[0]].lam
    assert 6.4 < lam_fold < 7.2  # Bratu fold ~6.81
