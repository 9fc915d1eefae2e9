"""Mesh adaptivity: ZZ error indicator, remesh-on-host, solution transfer,
transient continue-after-adapt (omega_h interface parity)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.adapt import transfer_solution, zz_error_indicator
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def _heat_problem(nx, ny, elem="QUAD4"):
    mesh = rectangle_mesh(nx, ny, elem=elem)
    prob = Problem(mesh, [Energy(interp="Q1" if elem == "QUAD4" else "Q2",
                                 transient=True, convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return mesh, prob


def test_transfer_exact_for_linear_fields():
    """A linear field transfers exactly between non-nested meshes."""
    _, p_old = _heat_problem(5, 4)
    _, p_new = _heat_problem(7, 6, elem="QUAD9")
    f = lambda X: 0.3 + 1.7 * X[:, 0] - 0.9 * X[:, 1]
    x_old = p_old.set_nodal_field(np.zeros(p_old.dofmap.n_dof), "temperature", 0, f)
    x_new = transfer_solution(p_old, x_old, p_new)
    got = p_new.get_nodal_field(x_new, "temperature")
    np.testing.assert_allclose(got, f(p_new.mesh.coords), atol=1e-11)


def test_zz_indicator_localizes_sharp_layer():
    """Steep layer at x ~ 0.75: the largest indicators sit in that column."""
    mesh, prob = _heat_problem(8, 4)
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "temperature", 0,
                             lambda X: np.tanh(30 * (X[:, 0] - 0.75)))
    eta = zz_error_indicator(prob, x, "temperature")
    assert eta.shape[0] == mesh.n_elem
    cx = mesh.coords[mesh.blocks[0].conn].mean(axis=1)[:, 0]
    worst = cx[np.argsort(eta)[-8:]]
    assert np.all(np.abs(worst - 0.75) < 0.2), worst


def test_remesh_and_continue_matches_fine_run():
    """Cooling of an initial sine mode: run coarse to t1, remesh finer,
    transfer (x, xdot), continue to t2; match analytic decay."""
    f0 = lambda X: np.sin(np.pi * X[:, 0])
    t1, t2 = 0.06, 0.12
    topts = dict(dt0=5e-3, adapt=False, theta=0.5, bootstrap_be=False)
    nopts = NewtonOptions(max_iter=6, tol_residual=1e-11, linear_solver="direct")

    mesh1, p1 = _heat_problem(7, 2)
    x0 = p1.set_nodal_field(np.zeros(p1.dofmap.n_dof), "temperature", 0, f0)
    r1 = TransientSolver(p1, nopts, TimeOptions(t_end=t1, **topts)).run(
        jnp.asarray(x0), p1.base_params())

    # adapt: indicator says where it is rough; here we refine globally
    eta = zz_error_indicator(p1, r1.x, "temperature")
    assert np.all(np.isfinite(eta))
    mesh2, p2 = _heat_problem(16, 2)
    x1, xdot1 = transfer_solution(p1, r1.x, p2, xdot_old=r1.xdot)
    r2 = TransientSolver(p2, nopts, TimeOptions(t_end=t2, **topts)).run(
        jnp.asarray(x1), p2.base_params(), t0=r1.t, xdot0=xdot1)

    T = p2.get_nodal_field(r2.x, "temperature")
    exact = np.exp(-np.pi**2 * t2) * f0(p2.mesh.coords)
    err = np.abs(T - exact).max()
    # coarse-then-fine should track the analytic decay closely
    assert err < 4e-3, err
