"""Batch 6: PCD on the cavity; twolevel with pre+post variations; restart
sweep with the f3e2 floor."""
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
    results["s1_f3e2"] = run_cfg(prob, params, x, "s1_f3e2", smooth_sweeps=1,
                                 max_iter=20, ew_eta_floor=3e-2)
    results["pcd"] = run_cfg(prob, params, x, "pcd", precond="pcd",
                             max_iter=20, ew_eta_floor=3e-2)
    results["s1_f1e1"] = run_cfg(prob, params, x, "s1_f1e1", smooth_sweeps=1,
                                 max_iter=25, ew_eta_floor=1e-1)
    results["s1_f3e2_r120"] = run_cfg(prob, params, x, "s1_f3e2_r120",
                                      smooth_sweeps=1, max_iter=20,
                                      ew_eta_floor=3e-2, gmres_restart=120,
                                      linear_maxiter=480)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")


if __name__ == "__main__":
    main()
