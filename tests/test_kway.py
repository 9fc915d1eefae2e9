"""Multilevel k-way dual-graph partitioning (METIS KWAY analog; reference
goma_metis_decomposition src/metis_decomp.c:372)."""

import numpy as np
import pytest

from goma_tpu.mesh import rectangle_mesh
from goma_tpu.mesh.partition import element_dual_graph, partition_elements
from goma_tpu.native import _lib, graph_edge_cut, kway_partition, rcb_partition


def test_dual_graph_structured():
    mesh = rectangle_mesh(4, 3, elem="QUAD4")
    xadj, adjncy, adjwgt = element_dual_graph(mesh)
    deg = np.diff(xadj)
    # interior quad has 8 node-sharing neighbors at ncommon>=2 (edge or
    # two shared corner nodes? corner-only pairs share 1 node -> excluded):
    # edge neighbors only: interior element has 4
    assert deg.max() == 4 and deg.min() == 2  # corners have 2
    # symmetric
    src = np.repeat(np.arange(xadj.shape[0] - 1), deg)
    pairs = set(zip(src.tolist(), adjncy.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    # edge weights: shared edge = 2 nodes
    assert np.all(adjwgt == 2)


@pytest.mark.parametrize("nparts", [2, 4, 7, 8])
def test_kway_balance_and_cut(nparts):
    mesh = rectangle_mesh(32, 32, elem="QUAD4")
    xadj, adjncy, adjwgt = element_dual_graph(mesh)
    part = kway_partition(xadj, adjncy, adjwgt, nparts)
    assert part.min() >= 0 and part.max() < nparts
    counts = np.bincount(part, minlength=nparts)
    assert counts.min() > 0
    # balanced within ~10%
    assert counts.max() <= int(1.10 * 1024 / nparts) + 2
    # edge cut is sane: no worse than 2x RCB's cut (usually better/equal)
    if _lib() is not None:
        from goma_tpu.mesh.partition import element_centroids

        rpart = rcb_partition(element_centroids(mesh), nparts)
        cut_k = graph_edge_cut(xadj, adjncy, adjwgt, part)
        cut_r = graph_edge_cut(xadj, adjncy, adjwgt, rpart)
        assert cut_k <= 2 * cut_r
        # parts are connected-ish: cut scales like perimeter, not area
        assert cut_k < 0.25 * adjwgt.sum() / 2


def test_partition_elements_kway_path():
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    part = partition_elements(mesh, 4, method="kway")
    assert part.shape == (64,)
    assert set(np.unique(part)) == {0, 1, 2, 3}


def test_partitioned_problem_kway_matches_single():
    """PartitionedProblem with the kway default reproduces the
    single-device Newton path."""
    import jax

    from goma_tpu.fem import Problem
    from goma_tpu.parallel.partitioned import (PartitionedNewtonSolver,
                                               PartitionedProblem)
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": 0.1})
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    res1 = NewtonSolver(prob, NewtonOptions(max_iter=10, linear_solver="direct")
                        ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res1.converged

    pp = PartitionedProblem(prob)  # kway default
    pn = PartitionedNewtonSolver(pp, max_iter=10, tol_residual=1e-10,
                                 linear_tol=1e-11, restart=120,
                                 linear_maxiter=2000)
    r2 = pn.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert r2.converged
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(res1.x),
                               atol=2e-6)
