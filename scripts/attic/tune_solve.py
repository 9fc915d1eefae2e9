"""TPU solve-tuning batch: full bench solves under different solver configs,
one process (compiles amortized). Prints s/iter per config."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run_cfg(prob, params, x, name, **kw):
    import jax
    import numpy as np

    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    opts = dict(max_iter=12, tol_residual=1e-6, linear_tol=1e-4,
                gmres_restart=240, linear_maxiter=480, precond="twolevel",
                smooth_sweeps=2)
    opts.update(kw)
    solver = NewtonSolver(prob, NewtonOptions(**opts))
    t0 = time.time()
    res_w = solver.solve(x, params)  # warmup/compile
    log(f"{name}: warmup {time.time()-t0:.0f}s iters={res_w.iters} "
        f"lin={res_w.linear_iters}")
    solver._fac_cache = None
    t0 = time.time()
    res = solver.solve(x, params)
    tt = time.time() - t0
    it = max(res.iters, 1)
    log(f"{name}: {tt/it*1000:.0f} ms/iter (asm {res.assembly_time/it*1000:.0f} "
        f"+ slv {res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged} total={tt:.2f}s")
    return tt / it


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cavity_problem

    log(f"backend {jax.default_backend()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    results = {}
    results["base_s2"] = run_cfg(prob, params, x, "base_s2")
    results["s1"] = run_cfg(prob, params, x, "s1", smooth_sweeps=1)
    results["s2_r120"] = run_cfg(prob, params, x, "s2_r120",
                                 gmres_restart=120)
    results["s1_bj"] = run_cfg(prob, params, x, "s1_bj", smoother="bj",
                               smooth_sweeps=1)
    results["s2_tol3e4"] = run_cfg(prob, params, x, "s2_tol3e4",
                                   linear_tol=3e-4)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter")


if __name__ == "__main__":
    main()
