"""Batch 4: prep after vals-revert + coarse-bf16 + damp variants."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def main():
    import jax, jax.numpy as jnp
    from __graft_entry__ import _cavity_problem
    from scripts.tune_solve import run_cfg
    log(f"backend {jax.default_backend()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    results = {}
    results["s1"] = run_cfg(prob, params, x, "s1", smooth_sweeps=1, max_iter=20)
    results["s1_bfc"] = run_cfg(prob, params, x, "s1_bfc", smooth_sweeps=1,
                                max_iter=20, precond_dtype="bf16-coarse")
    results["s1_d08"] = run_cfg(prob, params, x, "s1_d08", smooth_sweeps=1,
                                max_iter=20, smooth_damp=0.8)
    results["s1_r480"] = run_cfg(prob, params, x, "s1_r480", smooth_sweeps=1,
                                 max_iter=20, gmres_restart=480,
                                 linear_maxiter=960)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")

if __name__ == "__main__":
    import jax
    jax.config.update("jax_enable_x64", True)
    main()
