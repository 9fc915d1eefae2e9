"""TPU perf A/B on the 64x64 cavity (BENCH headline config):

  1. twolevel GMRES, ew_endgame="tighten" (round-2 default so far)
  2. twolevel GMRES, ew_endgame="standard" (classic EW oversolving guard)
  3. tpu_direct leaf=192 with lagged factorization (ndlu_lag)
  4. tpu_direct leaf=96 (exercises the chunked batched triangular_solve)

One process; warm every jitted path before timing (axon remote compiles
are minutes-slow)."""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(tag, prob, x0, params, opts_kw, reset=True):
    import jax.numpy as jnp

    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    solver = NewtonSolver(prob, NewtonOptions(
        max_iter=20, tol_residual=1e-6, **opts_kw))
    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    tw = time.perf_counter() - t0
    log(f"{tag}: warmup {tw:.0f}s iters={res.iters} conv={res.converged} "
        f"lin={res.linear_iters}")
    if reset:
        solver._fac_cache = None
        solver._ndlu_fac = None
    solver._ndlu_nfactor = 0
    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"{tag}: {tt/it*1000:.0f} ms/iter (asm {res.assembly_time/it*1000:.0f}"
        f" + slv {res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} nfactor={solver._ndlu_nfactor} "
        f"conv={res.converged} total {tt:.2f}s")
    return res


def main():
    import jax

    # f64 residual / f32 Jacobian+Krylov — bench.py's mixed-precision setup;
    # without x64 the f32 residual noise floor sits above tol_residual and
    # Newton churns at maxiter forever
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    params = prob.base_params()

    # bench-matched tuned options (bench.py tl_opts)
    tl = dict(linear_solver="gmres", precond="twolevel", smooth_sweeps=1,
              linear_tol=1e-4, gmres_restart=240, linear_maxiter=480)
    run("twolevel/tighten", prob, x0, params, tl)
    run("twolevel/standard", prob, x0, params, dict(tl, ew_endgame="standard"))
    nd = dict(linear_solver="tpu_direct", ndlu_leaf_max=192, ndlu_refine=2,
              linear_tol=1e-4)
    run("ndlu/leaf192/nolag", prob, x0, params, dict(nd, ndlu_lag=False))
    run("ndlu/leaf192/lag", prob, x0, params, nd, reset=False)
    run("ndlu/leaf96/lag", prob, x0, params, dict(nd, ndlu_leaf_max=96),
        reset=False)


if __name__ == "__main__":
    main()
