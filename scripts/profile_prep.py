"""TPU timing of the new fast-kernel _prep + full bench solve."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    log(f"backend: {jax.default_backend()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    solver = NewtonSolver(
        prob, NewtonOptions(max_iter=12, tol_residual=1e-6, linear_tol=1e-4,
                            gmres_restart=240, linear_maxiter=480,
                            precond="twolevel", smooth_sweeps=2))
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    t0 = time.perf_counter()
    out = solver._prep(x, params)
    jax.block_until_ready(out[0])
    log(f"compile _prep: {time.perf_counter()-t0:.0f}s")
    t = timeit(lambda: solver._prep(x, params))
    log(f"prep_mixed_fast: {t*1000:.1f} ms")

    # fast kernel alone (f32 J, f64 R) on the gathered dofs
    from goma_tpu.fem import fastns

    T = prob._tables
    FT = {k: T[f"{k}0"] for k in ("fns:gphi", "fns:gpsi", "fns:w")}
    g = T["g0"]
    meta, static = prob._fast_meta[0], prob._fast_static[0]
    xg = x[g]
    hg = params["hist"][g]

    f32 = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                 jnp.float32))
    f64r = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                  jnp.float64, with_jac=False))
    t0 = time.perf_counter(); jax.block_until_ready(f32(xg, hg)); log(f"compile f32 rj: {time.perf_counter()-t0:.0f}s")
    log(f"fast_rj_f32: {timeit(lambda: f32(xg, hg), n=30)*1000:.2f} ms")
    t0 = time.perf_counter(); jax.block_until_ready(f64r(xg, hg)[0]); log(f"compile f64 r: {time.perf_counter()-t0:.0f}s")
    log(f"fast_r_f64: {timeit(lambda: f64r(xg, hg)[0], n=30)*1000:.2f} ms")

    # full solve timing (warm + timed), the bench's asmslv metric
    log("warmup full solve...")
    t0 = time.perf_counter()
    res_w = solver.solve(x, params)
    log(f"warmup {time.perf_counter()-t0:.0f}s iters={res_w.iters} lin={res_w.linear_iters}")
    solver._fac_cache = None
    t0 = time.perf_counter()
    res = solver.solve(x, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"solve: {tt:.2f}s / {res.iters} iters = {tt/it*1000:.0f} ms/iter "
        f"(asm {res.assembly_time/it*1000:.0f} + slv {res.solve_time/it*1000:.0f}) "
        f"lin={res.linear_iters} conv={res.converged}")


if __name__ == "__main__":
    main()
