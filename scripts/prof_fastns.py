"""Profile the fused NS assembly pass piece by piece on the TPU.

Times each stage of the round-4 formulation (fem/fastns.py) in isolation,
plus layout/precision variants, to locate where the 33 ms full pass
(0.9 us/elem at 36.9k elements) actually goes — theory says the whole
pass is <1 ms of HBM traffic + VPU work.

Usage: python scripts/prof_fastns.py [n]   (default n=192 -> 36864 elems)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # chained timing through the remote tunnel: only a fetch waits
    leaves = jax.tree.leaves(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    _ = jax.device_get(leaves[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    jax.config.update("jax_enable_x64", True)
    from __graft_entry__ import _cavity_problem
    from goma_tpu.fem import fastns
    from goma_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    prob = _cavity_problem(n)
    prob.jacobian_dtype = jnp.float32
    ne = prob.mesh.n_elem
    params = prob.base_params()
    f32 = jnp.float32
    x = jnp.zeros(prob.dofmap.n_dof, dtype=f32)
    T = prob._tb(params)
    meta = prob._fast_meta[0]
    static = prob._fast_static[0]
    FT = {k: T[f"{k}0"] for k in
          ("fns:gphi", "fns:w", "fns:Kfix", "fns:Mvel")}
    FT32 = {k: v.astype(f32) for k, v in FT.items()}
    g = T["g0"]
    q = x[g]
    nl = q.shape[1]
    print(f"ne={ne} nl={nl} Kfix={FT['fns:Kfix'].shape} "
          f"{FT['fns:Kfix'].dtype}")

    def per_elem(t):
        return f"{t*1e3:8.3f} ms  {t/ne*1e6:7.4f} us/elem"

    # ---- full pass (what the bench measures) ----
    @jax.jit
    def full(x, p):
        R, rs, aux = prob._assemble_fast(x, p, rdt=f32)
        return R, rs

    print("full _assemble_fast f32      ", per_elem(timeit(full, x, params)))

    # ---- kernel only, via tables as args ----
    @jax.jit
    def kern(q, FT):
        r, J = fastns.ns_q2q1_rj(q, q, FT, meta, static, 0.0, f32)
        return r, J

    @jax.jit
    def kern_nojac(q, FT):
        r, _ = fastns.ns_q2q1_rj(q, q, FT, meta, static, 0.0, f32,
                                 with_jac=False)
        return r

    print("kernel r+J (f64 tabs, cast)  ", per_elem(timeit(kern, q, FT)))
    print("kernel r+J (f32 tabs)        ", per_elem(timeit(kern, q, FT32)))
    print("kernel r only (f32 tabs)     ",
          per_elem(timeit(kern_nojac, q, FT32)))

    # ---- stage microbenches, f32 tables ----
    Kfix = FT32["fns:Kfix"]
    gphi = FT32["fns:gphi"]
    w = FT32["fns:w"]
    Nu = jnp.asarray(static["Nu"], dtype=f32)
    qT = q.astype(f32).T
    nbu = static["su"][2]
    usz = 2 * nbu

    @jax.jit
    def s_linres(Kfix, qT):
        return jnp.einsum("ije,je->ie", Kfix, qT)

    print("  linear residual Kfix.q     ", per_elem(timeit(s_linres, Kfix, qT)))

    uu = qT[:usz].reshape(2, nbu, ne)

    @jax.jit
    def s_conv(gphi, w, uu):
        uval = jnp.einsum("qi,aie->qae", Nu, uu)
        gu = jnp.einsum("qike,aie->qake", gphi, uu)
        conv = jnp.einsum("qke,qake->qae", uval, gu)
        wconv = w[:, None, :] * conv
        return jnp.einsum("qae,qi->aie", wconv, Nu)

    print("  convection residual        ", per_elem(timeit(s_conv, gphi, w, uu)))

    @jax.jit
    def s_jconv(gphi, w, uu):
        uval = jnp.einsum("qi,aie->qae", Nu, uu)
        gu = jnp.einsum("qike,aie->qake", gphi, uu)
        cg = jnp.einsum("qke,qjke->qje", uval, gphi)
        wcg = w[:, None, :] * cg
        Jcd = jnp.einsum("qi,qje->ije", Nu, wcg)
        NN = jnp.einsum("qi,qj->qij", Nu, Nu)
        wgu = w[:, None, None, :] * gu
        Jab = jnp.einsum("qabe,qij->abije", wgu, NN)
        return Jcd, Jab

    print("  convection J blocks        ", per_elem(timeit(s_jconv, gphi, w, uu)))

    @jax.jit
    def s_jassemble(Kfix, Jcd, Jab):
        z2 = jnp.zeros_like(Jcd)
        top = jnp.concatenate([Jcd + Jab[0, 0], Jab[0, 1]], axis=1)
        bot = jnp.concatenate([Jab[1, 0], Jcd + Jab[1, 1]], axis=1)
        uu_blk = jnp.concatenate([top, bot], axis=0)
        return Kfix.at[:usz, :usz].add(uu_blk)

    Jcd, Jab = s_jconv(gphi, w, uu)
    print("  J at[].add assemble (ll)   ",
          per_elem(timeit(s_jassemble, Kfix, Jcd, Jab)))

    @jax.jit
    def s_transpose(J):
        return jnp.transpose(J, (2, 0, 1))

    Jll = s_jassemble(Kfix, Jcd, Jab)
    print("  J (nl,nl,ne)->(ne,nl,nl)   ", per_elem(timeit(s_transpose, Jll)))

    Jef = s_transpose(Jll)

    @jax.jit
    def s_rs_ef(J):
        return jnp.sum(jnp.abs(J), axis=2)

    @jax.jit
    def s_rs_ll(J):
        return jnp.sum(jnp.abs(J), axis=1)

    print("  rs sum|J| element-first    ", per_elem(timeit(s_rs_ef, Jef)))
    print("  rs sum|J| element-last     ", per_elem(timeit(s_rs_ll, Jll)))

    @jax.jit
    def s_mv_ef(J, v):
        return jnp.einsum("eij,ej->ei", J, v,
                          precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def s_mv_ll(J, vT):
        return jnp.einsum("ije,je->ie", J, vT,
                          precision=jax.lax.Precision.HIGHEST)

    print("  elem matvec element-first  ", per_elem(timeit(s_mv_ef, Jef, q.astype(f32))))
    print("  elem matvec element-last   ", per_elem(timeit(s_mv_ll, Jll, qT)))

    # ---- R combine transpose-gather ----
    tg = T["tg"]

    @jax.jit
    def s_combine(r):
        flat_r = jnp.concatenate([r.reshape(-1), jnp.zeros(1, dtype=f32)])
        return jnp.sum(flat_r[tg], axis=1)

    r0, _ = kern(q, FT32)
    print("  R combine tgather          ", per_elem(timeit(s_combine, r0)))

    # ---- gather q = x[g] ----
    @jax.jit
    def s_gather(x):
        return x[g]

    print("  x[gather]                  ", per_elem(timeit(s_gather, x)))


if __name__ == "__main__":
    main()
