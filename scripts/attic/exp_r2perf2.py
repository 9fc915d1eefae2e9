"""TPU perf A/B round 2 on the 64x64 cavity:

  1. GMRES + lagged NDLU preconditioner (precond="ndlu"): near-exact
     preconditioner, 1-5 its/Newton, factor amortized by precond_lag
  2. twolevel with pre-only cycle (smooth_post_sweeps=0)
  3. twolevel/standard-EW with pre-only cycle

f64 residual / f32 Jacobian+Krylov (bench.py setup)."""

import sys
import time

import numpy as np

from exp_r2perf import log, run  # noqa: E402  (same-dir import)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    params = prob.base_params()

    run("gmres+ndlu/lag", prob, x0, params,
        dict(linear_solver="gmres", precond="ndlu", ndlu_leaf_max=192,
             linear_tol=1e-4, gmres_restart=240, linear_maxiter=480),
        reset=False)
    tl0 = dict(linear_solver="gmres", precond="twolevel", smooth_sweeps=1,
               smooth_post_sweeps=0, linear_tol=1e-4, gmres_restart=240,
               linear_maxiter=480)
    run("twolevel/post0/tighten", prob, x0, params, tl0)
    run("twolevel/post0/standard", prob, x0, params,
        dict(tl0, ew_endgame="standard"))


if __name__ == "__main__":
    main()
