"""Newton damping-ladder parity + hard linear-solve failure propagation.

Reference: damp_factor1-3 / custom_tol1-3 relaxation ladder keyed on
||R||_inf (src/mm_sol_nonlinear.c:1998-2040, "Newton correction factor"
card src/mm_input.c:6538-6554); singular direct solves abort the Newton
iteration instead of propagating inf/nan.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _poisson(nx=6):
    mesh = rectangle_mesh(nx, nx, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False,
                                 convection=False)], {"k": 1.0, "heat_source": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return prob


def test_select_damp_ladder_branches():
    s = NewtonSolver(_poisson(), NewtonOptions(
        damp_factor1=0.8, damp_factor2=0.5, damp_factor3=0.2,
        custom_tol1=1e-6, custom_tol2=1e-3, custom_tol3=1e-1))
    assert s._select_damp(1.0) == 0.2       # > custom_tol3
    assert s._select_damp(1e-2) == 0.5      # > custom_tol2
    assert s._select_damp(1e-4) == 0.8      # > custom_tol1
    assert s._select_damp(1e-8) == 1.0      # below all -> full Newton
    # factor <= 1e-6 falls back to damp_factor1
    s2 = NewtonSolver(_poisson(), NewtonOptions(
        damp_factor1=0.7, damp_factor2=0.5, damp_factor3=0.0,
        custom_tol1=1e-6, custom_tol2=1e-3, custom_tol3=1e-1))
    assert s2._select_damp(1.0) == 0.7
    # ladder off (defaults): constant damp applies everywhere
    s3 = NewtonSolver(_poisson(), NewtonOptions(damp=0.9))
    assert s3._select_damp(1.0) == 0.9
    assert s3._select_damp(1e-12) == 0.9


def test_damping_ladder_applied_to_updates():
    """Linear problem: full Newton converges in 1 step; with damp_factor3=0.5
    above custom_tol3 the first update must be half the full step and the
    residual must drop by exactly half, then finish at full step."""
    prob = _poisson()
    x0 = np.zeros(prob.dofmap.n_dof)
    full = NewtonSolver(prob, NewtonOptions(linear_solver="direct")).solve(
        x0, prob.base_params())
    assert full.converged and full.iters <= 2

    # tolerances sized so only the FIRST iteration is damped (0.5): after
    # the half step ||R||inf halves and drops below custom_tol1 -> full step
    li0 = full.res_norms[0][2]
    lad = NewtonSolver(prob, NewtonOptions(
        linear_solver="direct",
        damp_factor1=0.9, damp_factor2=0.7, damp_factor3=0.5,
        custom_tol1=0.55 * li0, custom_tol2=0.65 * li0, custom_tol3=0.75 * li0,
    )).solve(x0, prob.base_params())
    assert lad.converged
    assert lad.iters == full.iters + 1
    # update_norms records the raw correction (pre-damping), like the
    # reference's Norm[1] print; the applied half step shows in the residual
    np.testing.assert_allclose(lad.update_norms[0], full.update_norms[0],
                               rtol=1e-10)
    # residual after the half step is half the initial residual (linear R)
    np.testing.assert_allclose(lad.res_norms[1][1], 0.5 * lad.res_norms[0][1],
                               rtol=1e-8)
    np.testing.assert_allclose(lad.x, full.x, atol=1e-10)


def test_singular_direct_solve_raises():
    from goma_tpu.solvers.linear import LinearSolveError, direct_solve_host

    # unpinned pure-Neumann Poisson: singular matrix
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False,
                                 convection=False)], {"k": 1.0, "heat_source": 1.0})
    prob.finalize()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    R, vals = prob._assemble(x, prob.base_params())
    with pytest.raises(LinearSolveError):
        direct_solve_host(prob.pattern, np.asarray(vals), np.asarray(R))

    # the Newton driver aborts unconverged instead of silently masking
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.asarray(x), prob.base_params())
    assert not res.converged
    assert np.all(np.isfinite(res.x))


def test_ew_endgame_standard_converges():
    """ew_endgame='standard' (the classic Eisenstat-Walker oversolving
    safeguard: eta >= 0.5 tol/||R||) converges the cavity to the same
    tolerance with strictly fewer total Krylov iterations than the
    'tighten' variant, which forces every mid-run solve to finishing
    accuracy."""
    import numpy as np

    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    from tests.test_ndlu import _cavity

    prob = _cavity(10)
    x0 = np.zeros(prob.dofmap.n_dof)
    rt = NewtonSolver(prob, NewtonOptions(
        max_iter=15, tol_residual=1e-6, ew_endgame="tighten")).solve(
        x0, prob.base_params())
    rs = NewtonSolver(prob, NewtonOptions(
        max_iter=15, tol_residual=1e-6, ew_endgame="standard")).solve(
        x0, prob.base_params())
    assert rt.converged and rs.converged
    assert rs.res_norms[-1][1] < 1e-6
    assert sum(rs.linear_iters) < sum(rt.linear_iters), (
        rs.linear_iters, rt.linear_iters)
