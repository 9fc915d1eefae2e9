"""Batch 7: GCRO-DR recycling on the bench cavity."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tune_solve import log, run_cfg


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from __graft_entry__ import _cavity_problem

    log(f"backend {jax.default_backend()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    results = {}
    results["rk16_f3e2"] = run_cfg(prob, params, x, "rk16_f3e2",
                                   smooth_sweeps=1, max_iter=20,
                                   ew_eta_floor=3e-2, recycle_k=16)
    results["rk32_f3e2"] = run_cfg(prob, params, x, "rk32_f3e2",
                                   smooth_sweeps=1, max_iter=20,
                                   ew_eta_floor=3e-2, recycle_k=32)
    results["rk16"] = run_cfg(prob, params, x, "rk16", smooth_sweeps=1,
                              max_iter=20, recycle_k=16)
    results["rk48_f3e2"] = run_cfg(prob, params, x, "rk48_f3e2",
                                   smooth_sweeps=1, max_iter=20,
                                   ew_eta_floor=3e-2, recycle_k=48)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")


if __name__ == "__main__":
    main()
