"""Batch 5: EW forcing floor + bf16-coarse + damp variants on the cavity.

The middle Newton iterations burn 200+ Krylov its each at tight EW
tolerances; ew_eta_floor caps that. Run in ONE process (compiles amortized).
"""
import os
import sys
import time

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
    results["s1"] = run_cfg(prob, params, x, "s1", smooth_sweeps=1,
                            max_iter=20)
    results["s1_f1e2"] = run_cfg(prob, params, x, "s1_f1e2", smooth_sweeps=1,
                                 max_iter=20, ew_eta_floor=1e-2)
    results["s1_f3e2"] = run_cfg(prob, params, x, "s1_f3e2", smooth_sweeps=1,
                                 max_iter=20, ew_eta_floor=3e-2)
    results["s1_bfc"] = run_cfg(prob, params, x, "s1_bfc", smooth_sweeps=1,
                                max_iter=20, precond_dtype="bf16-coarse")
    results["s1_d08"] = run_cfg(prob, params, x, "s1_d08", smooth_sweeps=1,
                                max_iter=20, smooth_damp=0.8)
    results["s1_f1e2_bfc"] = run_cfg(prob, params, x, "s1_f1e2_bfc",
                                     smooth_sweeps=1, max_iter=20,
                                     ew_eta_floor=1e-2,
                                     precond_dtype="bf16-coarse")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")


if __name__ == "__main__":
    main()
