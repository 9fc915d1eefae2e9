"""Scan-chained (dispatch-overhead-free) timing of fastns variants on TPU.

Each candidate runs ``loops`` data-dependent iterations inside ONE dispatch
(lax.scan), so per-call dispatch overhead and loop-invariant hoisting are
explicit: anything loop-invariant (like a f64->f32 table cast) is hoisted
and amortized — which is exactly what the round-4 bench measured without
knowing it.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def scan_time(body, x0, loops=32, reps=3):
    @jax.jit
    def run(x):
        def step(c, _):
            out = body(c)
            leaves = jax.tree.leaves(out)
            probe = sum(jnp.sum(l[..., :1]).astype(jnp.float32)
                        for l in leaves)
            return c + jnp.float32(1e-30) * probe, probe
        c, outs = jax.lax.scan(step, x, None, length=loops)
        return c, outs

    jax.device_get(run(x0)[0].ravel()[:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        c, _ = run(x0)
        jax.device_get(c.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / loops)
    return best


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
    FT32 = {k: jax.device_put(np.asarray(v, dtype=np.float32))
            for k, v in FT.items()}
    g = T["g0"]

    def pe(t):
        return f"{t*1e3:8.3f} ms  {t/ne*1e6:7.4f} us/elem"

    # full pass (scan) — current production shape, f64 tables cast inside
    print("full pass f64tabs (scan)  ",
          pe(scan_time(lambda c: prob._assemble_fast(c, params, rdt=f32)[:2],
                       x)))

    # kernel variants, x-dependent so nothing about q is hoisted
    def kern_f32(c):
        q = c[g]
        return fastns.ns_q2q1_rj(q, q, FT32, meta, static, 0.0, f32)

    def kern_f64(c):
        q = c[g]
        return fastns.ns_q2q1_rj(q, q, FT, meta, static, 0.0, f32)

    def kern_f32_nojac(c):
        q = c[g]
        return fastns.ns_q2q1_rj(q, q, FT32, meta, static, 0.0, f32,
                                 with_jac=False)[0]

    print("kern+gather f32tabs r+J   ", pe(scan_time(kern_f32, x)))
    print("kern+gather f64tabs r+J   ", pe(scan_time(kern_f64, x)))
    print("kern+gather f32tabs r     ", pe(scan_time(kern_f32_nojac, x)))

    # kernel + element-last rs + transpose-free (the planned shape):
    def kern_f32_rs(c):
        q = c[g]
        r, J = fastns.ns_q2q1_rj(q, q, FT32, meta, static, 0.0, f32)
        # J comes back (ne, nl, nl) today; rs over last axis
        rs = jnp.sum(jnp.abs(J), axis=2)
        return r, J, rs

    print("kern f32 + rs(ef)         ", pe(scan_time(kern_f32_rs, x)))

    # R combine through the transpose-gather, x-dependent
    tg = T["tg"]

    def combine(c):
        q = c[g]
        r, _ = fastns.ns_q2q1_rj(q, q, FT32, meta, static, 0.0, f32,
                                 with_jac=False)
        flat_r = jnp.concatenate([r.reshape(-1), jnp.zeros(1, dtype=f32)])
        return jnp.sum(flat_r[tg], axis=1)

    print("kern f32 r + R combine    ", pe(scan_time(combine, x)))

    # dispatch-free floor: a single gather
    print("x[gather] alone           ", pe(scan_time(lambda c: c[g], x)))


if __name__ == "__main__":
    main()
