"""Transient heat equation against the exact decaying eigenmode:
T(x,y,t) = sin(pi x) sin(pi y) exp(-2 pi^2 t). Validates the theta-method
corrector (BE vs CN accuracy), predictor, and adaptive-dt machinery."""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def heat_problem(n=6):
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    eqs = [Energy(interp="Q2", transient=True, convection=False)]
    prob = Problem(mesh, eqs, {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return mesh, prob


def initial_temperature(mesh, prob):
    T0 = np.sin(np.pi * mesh.coords[:, 0]) * np.sin(np.pi * mesh.coords[:, 1])
    x0 = np.zeros(prob.dofmap.n_dof)
    dofs = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("temperature")]
    x0[dofs[dofs >= 0]] = T0[dofs >= 0]
    return x0


def run_decay(theta, dt, t_end=0.05, n=6, adapt=False):
    mesh, prob = heat_problem(n)
    x0 = initial_temperature(mesh, prob)
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=6, tol_residual=1e-11, linear_tol=1e-12),
        TimeOptions(dt0=dt, t_end=t_end, theta=theta, adapt=adapt,
                    eps_time=1e-3, rel_tol=1e-4),
    )
    res = ts.run(x0, prob.base_params())
    lam = 2 * np.pi**2
    dofs = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("temperature")]
    ok = dofs >= 0
    exact = (
        np.sin(np.pi * mesh.coords[ok, 0])
        * np.sin(np.pi * mesh.coords[ok, 1])
        * np.exp(-lam * res.t)
    )
    err = np.max(np.abs(res.x[dofs[ok]] - exact))
    return err, res


def test_backward_euler_first_order():
    e1, _ = run_decay(theta=0.0, dt=0.01)
    e2, _ = run_decay(theta=0.0, dt=0.005)
    # first order: halving dt roughly halves error
    assert e1 / e2 == pytest.approx(2.0, rel=0.35), (e1, e2)


def test_crank_nicolson_second_order():
    e1, _ = run_decay(theta=0.5, dt=0.01)
    e2, _ = run_decay(theta=0.5, dt=0.005)
    assert e1 / e2 == pytest.approx(4.0, rel=0.5), (e1, e2)
    # CN beats BE at same dt
    eb, _ = run_decay(theta=0.0, dt=0.01)
    assert e1 < 0.3 * eb


def test_adaptive_dt_controller():
    # tight target: controller settles dt at the error-target equilibrium
    _, res = run_decay(theta=0.0, dt=1e-4, t_end=0.02, adapt=True)
    errs = [s.err_time for s in res.steps[3:]]
    assert max(errs) < 1.5e-3  # tracks eps_time=1e-3
    assert all(s.converged for s in res.steps)

    # loose target: dt grows at the growth cap from a tiny initial step
    mesh, prob = heat_problem(5)
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver
    from goma_tpu.solvers import NewtonOptions

    x0 = initial_temperature(mesh, prob)
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=6, tol_residual=1e-11, linear_tol=1e-12),
        TimeOptions(dt0=1e-5, t_end=0.01, theta=0.0, adapt=True, eps_time=1.0, rel_tol=1e-4),
    )
    r2 = ts.run(x0, prob.base_params())
    dts = [s.dt for s in r2.steps]
    assert dts[3] / dts[2] > 1.4  # growing at cap
    assert dts[-1] > 10 * dts[0]
