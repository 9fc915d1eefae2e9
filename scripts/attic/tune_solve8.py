"""Batch 8: pre-only V-cycle + refine_steps + combined cheapenings."""
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
    results["post0"] = run_cfg(prob, params, x, "post0", smooth_sweeps=1,
                               max_iter=20, ew_eta_floor=3e-2,
                               smooth_post_sweeps=0)
    results["post0_d1"] = run_cfg(prob, params, x, "post0_d1",
                                  smooth_sweeps=1, max_iter=20,
                                  ew_eta_floor=3e-2, smooth_post_sweeps=0,
                                  smooth_damp=1.0)
    results["pre2_post0"] = run_cfg(prob, params, x, "pre2_post0",
                                    smooth_sweeps=2, max_iter=20,
                                    ew_eta_floor=3e-2, smooth_post_sweeps=0)
    results["ref_s1_f3e2"] = run_cfg(prob, params, x, "ref_s1_f3e2",
                                     smooth_sweeps=1, max_iter=20,
                                     ew_eta_floor=3e-2)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")


if __name__ == "__main__":
    main()
