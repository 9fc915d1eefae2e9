"""GCRO-DR Krylov recycling across Newton iterations
(solvers/linear.py gmres_dr_cycle + harvest in solvers/newton.py)."""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _cavity(n=12, Re=200.0):
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": 1.0 / Re})
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    return prob


def test_recycled_newton_matches_plain():
    """Same converged solution, and the recycled run needs no more total
    Krylov iterations (typically far fewer on the later solves)."""
    prob = _cavity()
    x0 = np.zeros(prob.dofmap.n_dof)
    p = prob.base_params()

    def run(rk):
        s = NewtonSolver(prob, NewtonOptions(
            max_iter=15, tol_residual=1e-9, linear_tol=1e-6,
            gmres_restart=120, linear_maxiter=480, precond="twolevel",
            smooth_sweeps=1, recycle_k=rk))
        r = s.solve(x0, p)
        assert r.converged, r.summary()
        return r

    r0 = run(0)
    r1 = run(8)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x), atol=1e-7)
    assert sum(r1.linear_iters) <= sum(r0.linear_iters)
    # the deflation space must actually help once warm (last two solves)
    assert sum(r1.linear_iters[-2:]) < sum(r0.linear_iters[-2:])


def test_recycle_transient_reuse():
    """Recycling carries across time steps of a transient run and does not
    perturb the trajectory."""
    from goma_tpu.physics import Energy
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=True,
                                 convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    x0 = prob.set_nodal_field(
        np.zeros(prob.dofmap.n_dof), "temperature", 0,
        lambda c: np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))

    def run(rk):
        nopt = NewtonOptions(max_iter=8, tol_residual=1e-11, linear_tol=1e-9,
                             gmres_restart=80, linear_maxiter=320,
                             precond="block_jacobi", recycle_k=rk)
        ts = TransientSolver(prob, nopt,
                             TimeOptions(dt0=0.01, max_dt=0.01, t_end=0.05,
                                         theta=0.0, adapt=False))
        return ts.run(x0, prob.base_params())

    ra = run(0)
    rb = run(6)
    np.testing.assert_allclose(rb.x, ra.x, atol=1e-8)
