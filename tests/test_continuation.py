"""Continuation / arclength / augmenting conditions / stability tests.

- Bratu problem (-lap u = lam e^u): fold at lam_c ~= 6.808 (2D unit square);
  arclength continuation must round the fold onto the upper branch.
- First-order continuation on cavity Re sweep matches a direct solve.
- AC: source amplitude adjusted so the center temperature hits a target.
- LSA: heat-equation growth rates sigma_k = -(m^2+n^2) pi^2.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.continuation import (
    AugmentedNewtonSolver,
    AugmentingCondition,
    arclength_continue,
    continue_problem,
    solve_stability,
)
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def bratu_problem(n=8):
    mesh = rectangle_mesh(n, n, elem="QUAD9")

    def source(fv, mat, params):
        T = fv.val["temperature"][:, 0]
        return params["lam"] * jnp.exp(T)

    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"k": 1.0, "heat_source": source})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return mesh, prob


def test_bratu_continuation_and_fold():
    mesh, prob = bratu_problem(6)

    def make_params(lam):
        return prob.base_params(lam=jnp.asarray(lam, dtype=prob.dtype))

    steps = continue_problem(
        prob, make_params, 0.0, 5.0, 1.0, np.zeros(prob.dofmap.n_dof),
        NewtonOptions(max_iter=10, tol_residual=1e-10, linear_solver="direct"),
    )
    assert steps[-1].lam == pytest.approx(5.0)
    # continuation solution at lam=5 matches a from-scratch solve
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=30, tol_residual=1e-10, linear_solver="direct")
    ).solve(steps[-1].x, make_params(5.0))
    assert res.converged and res.iters <= 1

    # arclength rounds the fold near lam_c ~ 6.8 and continues to upper branch
    arc = arclength_continue(
        prob, make_params, 5.0, steps[-1].x, ds0=1.0, n_steps=25,
        newton_options=NewtonOptions(max_iter=12, tol_residual=1e-9, linear_solver="direct"),
        lam_scale=5.0,
    )
    lams = np.array([s.lam for s in arc])
    umax = np.array([s.x.max() for s in arc])
    lam_fold = lams.max()
    assert 6.5 < lam_fold < 7.1, lam_fold  # literature: ~6.808
    # went around: later steps have decreasing lam and larger amplitude
    assert lams[-1] < lam_fold - 0.3
    assert umax[-1] > umax[np.argmax(lams)] + 0.3


def test_augmenting_condition_hits_target():
    mesh, prob = bratu_problem(5)
    # AC: find lam such that max-norm dof (center) temperature == 0.3
    center = np.argmin(np.sum((mesh.coords - 0.5) ** 2, axis=1))
    dof = int(prob.dofmap.dof_of_node_svar[center, prob.dofmap.svar("temperature")])

    ac = AugmentingCondition(key="lam", g=lambda x, params: x[dof] - 0.3, p0=1.0)
    solver = AugmentedNewtonSolver(
        prob, [ac], NewtonOptions(max_iter=15, tol_residual=1e-10, linear_solver="direct")
    )
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params(lam=jnp.asarray(1.0)))
    assert res.converged, res.res_norms
    assert abs(res.x[dof] - 0.3) < 1e-10
    # cross-check: solving at the found lam reproduces the state
    direct = NewtonSolver(
        prob, NewtonOptions(max_iter=15, tol_residual=1e-11, linear_solver="direct")
    ).solve(res.x, prob.base_params(lam=jnp.asarray(res.p[0])))
    assert abs(direct.x[dof] - 0.3) < 1e-8


def test_hunting_multi_parameter():
    """Hunting (src/ac_hunt.c parity): two parameters marched together — the
    Bratu amplitude linearly, the conductivity on a logarithmic path — with a
    per-parameter step cap honored by the shared sweep coordinate."""
    from goma_tpu.continuation import HuntSpec, hunt_problem

    mesh = rectangle_mesh(6, 6, elem="QUAD9")

    def source(fv, mat, params):
        T = fv.val["temperature"][:, 0]
        return params["lam"] * jnp.exp(T)

    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"k": lambda fv, mat, params: params["kk"],
                    "heat_source": source})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()

    specs = [
        HuntSpec("lam", 0.5, 4.0, ds_max=0.7),
        HuntSpec("kk", 1.0, 4.0, log=True),
    ]
    steps = hunt_problem(
        prob, specs, np.zeros(prob.dofmap.n_dof), ds0=0.5,
        newton_options=NewtonOptions(max_iter=12, tol_residual=1e-10,
                                     linear_solver="direct"),
        base_params=prob.base_params(lam=jnp.asarray(0.5), kk=jnp.asarray(1.0)),
    )
    assert steps[-1].lam == pytest.approx(1.0)  # normalized sweep completed
    svals = np.array([s.lam for s in steps])
    lam_path = 0.5 + 3.5 * svals
    assert np.max(np.diff(lam_path)) <= 0.7 + 1e-9  # per-parameter cap held
    # endpoint matches a from-scratch solve at the final parameter values
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=20, tol_residual=1e-10, linear_solver="direct")
    ).solve(steps[-1].x, prob.base_params(lam=jnp.asarray(4.0), kk=jnp.asarray(4.0)))
    assert res.converged and res.iters <= 1


def test_lsa_heat_spectrum():
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=True, convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    res = solve_stability(prob, x0, prob.base_params(), n_modes=4, shift=-2 * np.pi**2)
    sig = np.sort(-res.growth_rates.real)  # decay rates ascending
    pi2 = np.pi**2
    exact = np.array([2 * pi2, 5 * pi2, 5 * pi2, 8 * pi2])
    np.testing.assert_allclose(sig[:4], exact, rtol=2e-3)
    assert res.stable


def test_fold_tracking_moore_spence():
    """Moore-Spence turning-point tracker (LOCA turning-point parity,
    src/loca_bord.c): converges onto the Bratu fold lam_c ~= 6.808 with a
    singular Jacobian and unit-normalized null vector."""
    from goma_tpu.continuation.bifurcation import fold_track

    mesh, prob = bratu_problem(6)

    def make_params(lam):
        return prob.base_params(lam=jnp.asarray(lam, dtype=prob.dtype))

    steps = continue_problem(
        prob, make_params, 0.0, 6.0, 1.0, np.zeros(prob.dofmap.n_dof),
        NewtonOptions(max_iter=12, tol_residual=1e-10, linear_solver="direct"),
    )
    fr = fold_track(prob, make_params, 6.0, steps[-1].x,
                    NewtonOptions(linear_solver="direct"), tol=1e-8)
    assert fr.converged, fr.res_norms
    # literature value for the 2D unit-square Bratu-Gelfand fold
    assert fr.lam == pytest.approx(6.808, abs=0.02)
    # the Jacobian is singular at the fold: J v ~ 0 with |v| = O(1)
    import jax

    Jv = jax.jvp(lambda xx: prob.residual(xx, make_params(fr.lam)),
                 (jnp.asarray(fr.x),), (jnp.asarray(fr.null_vector),))[1]
    assert float(jnp.abs(Jv).max()) < 1e-6
    assert np.linalg.norm(fr.null_vector) > 0.5


def test_lsa_device_arnoldi_matches_host():
    """Device shift-invert Arnoldi (framework GMRES inner solves) reproduces
    the scipy host path on the heat spectrum."""
    from goma_tpu.continuation.stability import solve_stability_device

    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=True, convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    res = solve_stability_device(prob, x0, prob.base_params(), n_modes=4,
                                 shift=-2 * np.pi**2)
    sig = np.sort(-res.growth_rates.real)
    pi2 = np.pi**2
    exact = np.array([2 * pi2, 5 * pi2, 5 * pi2, 8 * pi2])
    np.testing.assert_allclose(sig[:4], exact, rtol=2e-3)
    assert res.stable
