"""TPU experiment: fastest way to assemble NDLU fronts from CSR values.

Candidates, per level (nn fronts of size f x f, compact (lin, src) pairs):
  A. dense gmap gather, map as jit ARG          (current: ~625 ms total)
  B. compact scatter-set, indices as jit ARGS
  C. compact scatter-set, indices as CONSTANTS  (payload risk)
  D. pallas kernel: vals in VMEM, per-block gather
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def t_of(fn, reps=5):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_enable_x64", True)
    from goma_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers.ndlu import NDLU

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    _, vals, _ = prob._assemble_with_elem(x, params)
    vals = vals.astype(jnp.float32)
    nd = NDLU(prob.pattern, leaf_max=192, dtype=jnp.float32, invert=True)
    vals_ext = jnp.concatenate([jnp.zeros(1, jnp.float32), vals])

    # ---- A: dense gmap as ARG (current)
    @jax.jit
    def dense_arg(ve, tabs):
        return [ve[tb["gmap_a"]] for tb in tabs]

    tA = t_of(lambda: dense_arg(vals_ext, nd.tabs)[0])
    log(f"A dense-gmap ARG: {tA*1000:.1f} ms")
    F_ref = dense_arg(vals_ext, nd.tabs)

    # ---- B: compact scatter-set, indices as ARGS
    lins = [jax.device_put(lv.a_lin.astype(np.int32)) for lv in nd.levels]
    srcs = [jax.device_put(lv.a_src.astype(np.int32)) for lv in nd.levels]
    shapes = [(lv.nn, lv.smax + lv.bmax, lv.smax + lv.bmax)
              for lv in nd.levels]

    @jax.jit
    def compact_arg(v, lins, srcs):
        out = []
        for (nn, f, _), lin, src in zip(shapes, lins, srcs):
            Ff = jnp.zeros(nn * f * f, jnp.float32)
            Ff = Ff.at[lin].set(v[src], unique_indices=True,
                                indices_are_sorted=False)
            out.append(Ff.reshape(nn, f, f))
        return out

    tB = t_of(lambda: compact_arg(vals, lins, srcs)[0])
    log(f"B compact scatter ARG: {tB*1000:.1f} ms")
    FB = compact_arg(vals, lins, srcs)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(F_ref, FB))
    log(f"  max |A-B| = {err:.2e}")

    # ---- B2: compact scatter with HOST-SORTED lin (indices_are_sorted)
    lins_s, srcs_s = [], []
    for lv in nd.levels:
        o = np.argsort(lv.a_lin, kind="stable")
        lins_s.append(jax.device_put(lv.a_lin[o].astype(np.int32)))
        srcs_s.append(jax.device_put(lv.a_src[o].astype(np.int32)))

    @jax.jit
    def compact_sorted(v, lins, srcs):
        out = []
        for (nn, f, _), lin, src in zip(shapes, lins, srcs):
            Ff = jnp.zeros(nn * f * f, jnp.float32)
            Ff = Ff.at[lin].set(v[src], unique_indices=True,
                                indices_are_sorted=True)
            out.append(Ff.reshape(nn, f, f))
        return out

    tB2 = t_of(lambda: compact_sorted(vals, lins_s, srcs_s)[0])
    log(f"B2 compact scatter sorted ARG: {tB2*1000:.1f} ms")

    # ---- C: compact scatter with CONSTANT indices (payload risk) — only
    # try if B shows promise; constants inline ~18 MB into the program
    try:
        linc = [lv.a_lin.astype(np.int32) for lv in nd.levels]
        srcc = [lv.a_src.astype(np.int32) for lv in nd.levels]

        @jax.jit
        def compact_const(v):
            out = []
            for (nn, f, _), lin, src in zip(shapes, linc, srcc):
                Ff = jnp.zeros(nn * f * f, jnp.float32)
                Ff = Ff.at[lin].set(v[src], unique_indices=True)
                out.append(Ff.reshape(nn, f, f))
            return out

        tC = t_of(lambda: compact_const(vals)[0])
        log(f"C compact scatter CONST: {tC*1000:.1f} ms")
    except Exception as e:
        log(f"C failed: {type(e).__name__}: {str(e)[:120]}")

    # ---- D: pallas per-level gather with vals resident in VMEM
    try:
        from functools import partial

        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def gather_kernel(v_ref, g_ref, o_ref):
            o_ref[:] = jnp.take(v_ref[:], g_ref[:], axis=0,
                                fill_value=None, mode="clip")

        def pallas_gather(v, g2d, blk):
            n = g2d.shape[0]
            return pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct(g2d.shape, jnp.float32),
                grid=(n // blk,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # full vals
                    pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(v, g2d)

        @jax.jit
        def dense_pallas(ve, tabs):
            out = []
            for (nn, f, _), tb in zip(shapes, tabs):
                g = tb["gmap_a"].reshape(-1)
                L = g.shape[0]
                pad = (-L) % (128 * 8)
                g2 = jnp.concatenate([g, jnp.zeros(pad, g.dtype)])
                g2 = g2.reshape(-1, 128)
                Ff = pallas_gather(ve, g2, 8).reshape(-1)[:L]
                out.append(Ff.reshape(nn, f, f))
            return out

        tD = t_of(lambda: dense_pallas(vals_ext, nd.tabs)[0])
        log(f"D pallas VMEM gather: {tD*1000:.1f} ms")
        FD = dense_pallas(vals_ext, nd.tabs)
        err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(F_ref, FD))
        log(f"  max |A-D| = {err:.2e}")
    except Exception as e:
        log(f"D failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
