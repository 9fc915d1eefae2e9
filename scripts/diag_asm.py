"""Isolate the assembly-path costs: fast kernel (rolled loop) alone, vals
via segment_sum vs transpose-gather, R combine, full _prep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit(fn, n=30, warmup=3):
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
    import numpy as np

    from __graft_entry__ import _cavity_problem
    from goma_tpu.fem import fastns

    log(f"backend {jax.default_backend()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    T = prob._tables
    FT = {k: T[f"{k}0"] for k in ("fns:gphi", "fns:gpsi", "fns:w")}
    g = T["g0"]
    meta, static = prob._fast_meta[0], prob._fast_static[0]
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    xg = x[g]
    hg = params["hist"][g]

    f32 = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                 jnp.float32))
    t0 = time.perf_counter()
    r, J = f32(xg, hg)
    jax.block_until_ready(J)
    log(f"compile fast f32 (rolled): {time.perf_counter()-t0:.0f}s")
    log(f"fast_rj_f32 rolled: {timeit(lambda: f32(xg, hg))*1000:.2f} ms")

    f64r = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                  jnp.float64,
                                                  with_jac=False)[0])
    jax.block_until_ready(f64r(xg, hg))
    log(f"fast_r_f64 rolled: {timeit(lambda: f64r(xg, hg))*1000:.2f} ms")

    # vals combine: segment_sum vs transpose gather
    nmap = T["n0"]
    nnz = prob.pattern.nnz
    Jflat = J.reshape(-1)
    seg = jax.jit(lambda Jf: jax.ops.segment_sum(
        Jf, nmap.reshape(-1), num_segments=nnz))
    jax.block_until_ready(seg(Jflat))
    log(f"vals segment_sum: {timeit(lambda: seg(Jflat))*1000:.2f} ms")

    ntg = T["nnztg"]
    tg = jax.jit(lambda Jf: jnp.sum(jnp.concatenate(
        [Jf, jnp.zeros(1, dtype=Jf.dtype)])[ntg], axis=1))
    jax.block_until_ready(tg(Jflat))
    log(f"vals transpose-gather (int64 idx): {timeit(lambda: tg(Jflat))*1000:.2f} ms")

    ntg32 = jax.device_put(np.asarray(jax.device_get(ntg), dtype=np.int32))
    tg32 = jax.jit(lambda Jf: jnp.sum(jnp.concatenate(
        [Jf, jnp.zeros(1, dtype=Jf.dtype)])[ntg32], axis=1))
    jax.block_until_ready(tg32(Jflat))
    log(f"vals transpose-gather (int32 idx): {timeit(lambda: tg32(Jflat))*1000:.2f} ms")

    # R combine
    rflat = r.reshape(-1).astype(jnp.float64)
    tgd = T["tg"]
    rg = jax.jit(lambda rf: jnp.sum(jnp.concatenate(
        [rf, jnp.zeros(1, dtype=rf.dtype)])[tgd], axis=1))
    jax.block_until_ready(rg(rflat))
    log(f"R transpose-gather: {timeit(lambda: rg(rflat))*1000:.2f} ms")
    segR = jax.jit(lambda rf: jax.ops.segment_sum(
        rf, g.reshape(-1), num_segments=prob.dofmap.n_dof))
    jax.block_until_ready(segR(rflat))
    log(f"R segment_sum: {timeit(lambda: segR(rflat))*1000:.2f} ms")

    # full prep
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    solver = NewtonSolver(prob, NewtonOptions(precond="twolevel",
                                              smooth_sweeps=1))
    t0 = time.perf_counter()
    out = solver._prep(x, params)
    jax.block_until_ready(out[0])
    log(f"compile _prep: {time.perf_counter()-t0:.0f}s")
    log(f"_prep: {timeit(lambda: solver._prep(x, params), n=10)*1000:.1f} ms")


if __name__ == "__main__":
    main()
