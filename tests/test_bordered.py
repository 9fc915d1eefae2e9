"""AC-bordered overset multipliers (create_overlap_acs parity):
the bordered Schur solve must reproduce the monolithic solution."""

import numpy as np

from goma_tpu.fem import Problem
from goma_tpu.mesh import circle_block, rectangle_mesh
from goma_tpu.physics import Continuity, Momentum, OversetLM, OversetNoSlip
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.solvers.bordered import (BorderedNewtonSolver,
                                       multiplier_dof_mask)


def _immersed(nx=10, ny=5, n_seg=10):
    mesh = rectangle_mesh(nx, ny, elem="QUAD9", xlim=(0, 2.0), ylim=(0, 1.0))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    bi = circle_block(mesh, (0.8, 0.5), 0.2, n=n_seg, name="cylinder")
    prob = Problem(
        mesh,
        [[Momentum(dim=2, interp="Q2", transient=False, convection=False),
          Continuity(interp="Q1")],
         [OversetLM(dim=2)]],
        [{"rho": 1.0, "mu": 1.0}, {}])
    prob.add_dirichlet("left", "velocity", 0,
                       lambda c: 4 * c[:, 1] * (1 - c[:, 1]))
    prob.add_dirichlet("top", "velocity", 0, 0.0)
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    for ns in ("left", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_overset(bi, 0, OversetNoSlip(dim=2))
    prob.finalize()
    return prob


def test_bordered_matches_monolithic():
    prob = _immersed()
    x0 = np.zeros(prob.dofmap.n_dof)
    params = prob.base_params()
    mono = NewtonSolver(prob, NewtonOptions(
        max_iter=8, tol_residual=1e-9, linear_solver="direct")).solve(
        x0, params)
    assert mono.converged

    mask = multiplier_dof_mask(prob)
    assert mask.sum() == 10 * 2  # one 2-vector multiplier per segment
    bs = BorderedNewtonSolver(prob, mask, NewtonOptions(
        max_iter=8, tol_residual=1e-8), base_solver="ndlu")
    res = bs.solve(x0, params)
    assert res.converged
    err = np.linalg.norm(res.x - np.asarray(mono.x)) / np.linalg.norm(mono.x)
    assert err < 1e-6


def test_bordered_host_base_solver():
    prob = _immersed(nx=8, ny=4, n_seg=8)
    x0 = np.zeros(prob.dofmap.n_dof)
    params = prob.base_params()
    mask = multiplier_dof_mask(prob)
    bs = BorderedNewtonSolver(prob, mask, NewtonOptions(
        max_iter=8, tol_residual=1e-9), base_solver="direct")
    res = bs.solve(x0, params)
    assert res.converged
    # multipliers are nonzero (the cylinder exerts drag on the flow)
    assert np.abs(res.x[mask]).max() > 1e-3
