"""TPU round-3 A/B: cavity gmres+ndlu variants.

Sweeps (leaf_max, recycle_k, linear_tol) and times the full Newton solve.
"""

import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    cases = [
        ("base192", dict(ndlu_leaf_max=192)),
        ("leaf320", dict(ndlu_leaf_max=320)),
        ("leaf448", dict(ndlu_leaf_max=448)),
        ("recycle20", dict(ndlu_leaf_max=192, recycle_k=20)),
        ("loose3e-4", dict(ndlu_leaf_max=192, linear_tol=3e-4)),
        ("r20+loose", dict(ndlu_leaf_max=192, recycle_k=20, linear_tol=3e-4)),
    ]
    results = {}
    for name, kw in cases:
        base = dict(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                    precond="ndlu", linear_solver="gmres",
                    gmres_restart=60, linear_maxiter=240)
        base.update(kw)
        opts = NewtonOptions(**base)
        solver = NewtonSolver(prob, opts)
        t0 = time.perf_counter()
        res = solver.solve(x0, params)
        log(f"[{name}] warmup {time.perf_counter()-t0:.0f}s "
            f"it={res.iters} lin={res.linear_iters} conv={res.converged}")
        solver._fac_cache = None
        solver._recycle_U = None
        t0 = time.perf_counter()
        res = solver.solve(x0, params)
        t = time.perf_counter() - t0
        it = max(res.iters, 1)
        results[name] = (t / it, res.converged, res.iters,
                         sum(res.linear_iters))
        log(f"[{name}] {t/it*1000:.0f} ms/iter (iters={res.iters}, "
            f"lin_total={sum(res.linear_iters)}, conv={res.converged}, "
            f"asm {res.assembly_time/it*1000:.0f} + "
            f"slv {res.solve_time/it*1000:.0f})")
    log("== summary ==")
    for name, (spi, conv, its, lint) in sorted(results.items(),
                                               key=lambda kv: kv[1][0]):
        log(f"  {name:12s} {spi*1000:7.0f} ms/iter conv={conv} "
            f"newton={its} lin={lint}")


if __name__ == "__main__":
    main()
