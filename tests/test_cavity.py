"""BASELINE config #1: 2D steady lid-driven cavity, incompressible
Navier-Stokes, Q2/Q1 (Taylor-Hood) quads, full Newton.

Validates: quadratic Newton convergence with the AD Jacobian, mixed
interpolation dof map, GMRES+block-Jacobi vs host direct solve agreement,
and coarse agreement with the Ghia et al. benchmark centerline velocity.
"""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def cavity_problem(n=8, Re=100.0):
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)  # pressure datum
    eqs = [
        Momentum(dim=2, interp="Q2", transient=False),
        Continuity(interp="Q1"),
    ]
    mat = {"rho": 1.0, "mu": 1.0 / Re}
    prob = Problem(mesh, eqs, mat)
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    # regularized lid (corner-compatible): u = 1 on top, corners shared with
    # side walls get 0 (side walls are registered first; first spec wins per
    # the mm_bc_conflict.c dup rule)
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    prob.add_dirichlet("left", "velocity", 0, 0.0)
    prob.add_dirichlet("right", "velocity", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    return mesh, prob


def test_cavity_newton_quadratic():
    mesh, prob = cavity_problem(n=8, Re=100.0)
    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-10, linear_tol=1e-11, gmres_restart=80,
                      linear_maxiter=2000),
    )
    x0 = np.zeros(prob.dofmap.n_dof)
    res = solver.solve(x0, prob.base_params())
    assert res.converged, res.summary()
    # full Newton on Re=100 from zero initial guess: converges in <= 8 its
    assert res.iters <= 8, res.summary()
    # quadratic tail: last pre-converged step should drop fast
    l2 = [r[1] for r in res.res_norms]
    assert l2[-1] < 1e-10


def test_cavity_gmres_matches_direct():
    _, prob = cavity_problem(n=6, Re=50.0)
    x0 = np.zeros(prob.dofmap.n_dof)
    r1 = NewtonSolver(
        prob, NewtonOptions(linear_solver="direct", max_iter=10, tol_residual=1e-10)
    ).solve(x0, prob.base_params())
    r2 = NewtonSolver(
        prob,
        NewtonOptions(
            linear_solver="gmres", max_iter=10, tol_residual=1e-10, linear_tol=1e-12,
            gmres_restart=80, linear_maxiter=3000,
        ),
    ).solve(x0, prob.base_params())
    assert r1.converged and r2.converged
    assert r1.iters == r2.iters, (r1.summary(), r2.summary())
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-6)


def test_cavity_ghia_centerline():
    """Coarse-mesh sanity vs Ghia et al. (1982) Re=100 cavity: u_x at
    (0.5, y): u(0.5, 0.5) ~ -0.2058; min u on centerline ~ -0.21."""
    mesh, prob = cavity_problem(n=16, Re=100.0)
    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-9, linear_tol=1e-10, gmres_restart=100,
                      linear_maxiter=4000),
    )
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    # extract u_x at nodes on the vertical centerline
    mask = np.abs(mesh.coords[:, 0] - 0.5) < 1e-12
    ys = mesh.coords[mask, 1]
    dofs = prob.dofmap.dof_of_node_svar[mask, prob.dofmap.svar("velocity", 0)]
    ux = res.x[dofs]
    # u at y=0.5
    mid = np.argmin(np.abs(ys - 0.5))
    assert abs(ux[mid] - (-0.2058)) < 0.02, ux[mid]
