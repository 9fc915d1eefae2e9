"""Native mesh-prep tests: RCB balance/compactness, Morton locality,
element reordering preserves solutions."""

import numpy as np
import pytest

from goma_tpu.mesh import rectangle_mesh
from goma_tpu.mesh.partition import element_centroids, partition_elements, reorder_elements
from goma_tpu.native import _lib, morton_order, rcb_partition


def test_native_lib_compiles():
    assert _lib() is not None, "C++ meshprep failed to compile; fallback would hide perf"


def test_rcb_balance_and_compactness():
    rng = np.random.RandomState(0)
    pts = rng.rand(1000, 2)
    for nparts in (2, 4, 7, 8):
        part = rcb_partition(pts, nparts)
        counts = np.bincount(part, minlength=nparts)
        assert counts.min() >= 1000 // nparts - 2
        assert counts.max() <= 1000 // nparts + 2
        # compact: average intra-part spread much smaller than domain
        for p in range(nparts):
            box = pts[part == p]
            assert (box.max(0) - box.min(0)).prod() < 2.5 / nparts


def test_morton_locality():
    mesh = rectangle_mesh(16, 16, elem="QUAD4")
    cent = element_centroids(mesh)
    order = morton_order(cent)
    # consecutive elements in morton order are spatially close
    d = np.linalg.norm(np.diff(cent[order], axis=0), axis=1)
    assert np.median(d) < 2.5 / 16  # neighbors most of the time
    assert sorted(order.tolist()) == list(range(mesh.n_elem))


def test_reorder_preserves_solution():
    from goma_tpu.fem import Problem
    from goma_tpu.physics import Energy
    from goma_tpu.solvers import NewtonOptions, NewtonSolver
    import jax.numpy as jnp

    def solve(mesh):
        def src(fv, mat, params):
            return jnp.sin(jnp.pi * fv.x[:, 0]) * jnp.sin(jnp.pi * fv.x[:, 1])

        prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                       {"k": 1.0, "heat_source": src})
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, "temperature", 0, 0.0)
        prob.finalize()
        res = NewtonSolver(prob, NewtonOptions(max_iter=3, linear_tol=1e-12)).solve(
            np.zeros(prob.dofmap.n_dof), prob.base_params()
        )
        return prob.get_nodal_field(res.x, "temperature")

    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    m2 = reorder_elements(mesh, "morton")
    T1 = solve(mesh)
    T2 = solve(m2)
    np.testing.assert_allclose(T1, T2, atol=1e-10)
    # sidesets still on the boundary
    assert set(m2.sidesets) == set(mesh.sidesets)
