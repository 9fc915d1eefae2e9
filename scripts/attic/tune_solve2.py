"""TPU solve-tuning batch 2: sweeps=1 + bf16 precond + EW eta floor on top
of the scatter-free prep and rolled fast kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run_cfg(prob, params, x, name, **kw):
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    opts = dict(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                gmres_restart=240, linear_maxiter=480, precond="twolevel",
                smooth_sweeps=1)
    opts.update(kw)
    solver = NewtonSolver(prob, NewtonOptions(**opts))
    t0 = time.time()
    res_w = solver.solve(x, params)
    log(f"{name}: warmup {time.time()-t0:.0f}s iters={res_w.iters} "
        f"lin={res_w.linear_iters}")
    solver._fac_cache = None
    t0 = time.time()
    res = solver.solve(x, params)
    tt = time.time() - t0
    it = max(res.iters, 1)
    log(f"{name}: {tt/it*1000:.0f} ms/iter (asm {res.assembly_time/it*1000:.0f}"
        f" + slv {res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged} total={tt:.2f}s")
    return tt / it, tt


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
    results["s1_new"] = run_cfg(prob, params, x, "s1_new")
    results["s1_bf16"] = run_cfg(prob, params, x, "s1_bf16",
                                 precond_dtype="bf16")
    results["s1_bf16_floor1e2"] = run_cfg(prob, params, x, "s1_bf16_floor1e2",
                                          precond_dtype="bf16",
                                          ew_eta_floor=1e-2)
    results["s1_bf16_floor3e2"] = run_cfg(prob, params, x, "s1_bf16_floor3e2",
                                          precond_dtype="bf16",
                                          ew_eta_floor=3e-2)
    results["s2_bf16_floor1e2"] = run_cfg(prob, params, x, "s2_bf16_floor1e2",
                                          precond_dtype="bf16",
                                          ew_eta_floor=1e-2,
                                          smooth_sweeps=2)
    for k, (v, tt) in sorted(results.items(), key=lambda kv: kv[1][0]):
        log(f"RESULT {k}: {v*1000:.0f} ms/iter (total {tt:.1f}s)")


if __name__ == "__main__":
    main()
