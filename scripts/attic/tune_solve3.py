"""Batch 3: assembly A/B (diag_asm) + f32 eta-floor configs, one process."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def main():
    import runpy
    import importlib
    log("=== diag_asm ===")
    import scripts.diag_asm as da
    da.main()
    log("=== solve configs ===")
    import jax, jax.numpy as jnp
    from __graft_entry__ import _cavity_problem
    from scripts.tune_solve import run_cfg
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    results = {}
    results["s1"] = run_cfg(prob, params, x, "s1", smooth_sweeps=1, max_iter=20)
    results["s1_floor1e2"] = run_cfg(prob, params, x, "s1_floor1e2",
                                     smooth_sweeps=1, max_iter=25,
                                     ew_eta_floor=1e-2)
    results["s1_floor3e2"] = run_cfg(prob, params, x, "s1_floor3e2",
                                     smooth_sweeps=1, max_iter=30,
                                     ew_eta_floor=3e-2)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")

if __name__ == "__main__":
    import jax
    jax.config.update("jax_enable_x64", True)
    main()
