"""Front-assembly timing, round 3: device_get-forced timing (the axon
tunnel's block_until_ready returns early), index tables as jit ARGS."""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def t_of(fn, reps=5):
    """fn must return a SCALAR depending on all work; device_get syncs."""
    import jax
    float(jax.device_get(fn()))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(jax.device_get(fn()))
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
    from goma_tpu.solvers.twolevel import _saddle_mask

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    _, vals, _ = prob._assemble_with_elem(x, params)
    vals = vals.astype(jnp.float32)
    nd = NDLU(prob.pattern, leaf_max=192, dtype=jnp.float32, invert=True,
              defer_dofs=_saddle_mask(prob))
    vals_ext = jnp.concatenate([jnp.zeros(1, jnp.float32), vals])
    shapes = [(lv.nn, lv.smax + lv.bmax) for lv in nd.levels]

    @jax.jit
    def dense_arg(ve, tabs):
        s = jnp.zeros((), jnp.float32)
        for tb in tabs:
            s = s + jnp.sum(ve[tb["gmap_a"]])
        return s

    log(f"A dense-gmap ARG: {t_of(lambda: dense_arg(vals_ext, nd.tabs))*1000:.1f} ms")

    lins = [jax.device_put(lv.a_lin.astype(np.int32)) for lv in nd.levels]
    srcs = [jax.device_put(lv.a_src.astype(np.int32)) for lv in nd.levels]

    @jax.jit
    def compact_arg(v, lins_a, srcs_a):
        s = jnp.zeros((), jnp.float32)
        for (nn, f), lin, src in zip(shapes, lins_a, srcs_a):
            Ff = jnp.zeros(nn * f * f, jnp.float32)
            Ff = Ff.at[lin].set(v[src], unique_indices=True)
            s = s + jnp.sum(Ff)
        return s

    log(f"B compact scatter ARG: {t_of(lambda: compact_arg(vals, lins, srcs))*1000:.1f} ms")

    # full factor, current front assembly
    @jax.jit
    def fac_sum(v, tabs):
        facs = nd._factor(v, tabs)
        return sum(jnp.sum(jnp.abs(f[0])) for f in facs)

    log(f"factor (dense fronts): {t_of(lambda: fac_sum(vals, nd.tabs), reps=3)*1000:.1f} ms")

    # full factor with compact-scatter fronts (tables as ARGS)
    def _factor_compact(v, tabs, lins_a, srcs_a):
        from goma_tpu.solvers.ndlu import triangular_solve
        from goma_tpu.solvers.pallas_lu import batched_lu

        facs = []
        S_prev = None
        hi = jax.lax.Precision.HIGHEST
        v32 = v.astype(nd.dtype)
        for li, (lev, tb) in enumerate(zip(nd.levels, tabs)):
            nn, f = shapes[li]
            Ff = jnp.zeros(nn * f * f, nd.dtype)
            F = Ff.at[lins_a[li]].set(v32[srcs_a[li]],
                                      unique_indices=True).reshape(nn, f, f)
            if S_prev is not None and tb["p0"] is not None:
                for P, idx in ((tb["p0"], tb["i0"]), (tb["p1"], tb["i1"])):
                    Sc = S_prev[idx].astype(nd.dtype)
                    F = F + jnp.einsum("qfa,qab,qgb->qfg", P, Sc, P,
                                       precision=hi)
            if lev.pad_node.shape[0]:
                F = F.at[tb["pad_node"], tb["pad_slot"],
                         tb["pad_slot"]].add(1.0)
            s = lev.smax
            lu = batched_lu(F[:, :s, :s], pivot_tol=nd.pivot_tol,
                            interpret=nd._pl_interpret)
            m = lu.shape[-1]
            eye = jnp.broadcast_to(jnp.eye(m, dtype=nd.dtype), (lev.nn, m, m))
            fwd = triangular_solve(lu, eye, left_side=True, lower=True,
                                   unit_diagonal=True)
            bwd = triangular_solve(lu, eye, left_side=True, lower=False)
            if lev.bmax:
                Y = fwd @ F[:, :s, s:]
                X = F[:, s:, :s] @ bwd
                S_prev = F[:, s:, s:] - X @ Y
            else:
                X = jnp.zeros((lev.nn, 0, m), nd.dtype)
                Y = jnp.zeros((lev.nn, m, 0), nd.dtype)
                S_prev = jnp.zeros((lev.nn, 0, 0), nd.dtype)
            facs.append((fwd, bwd, None, X, Y))
        return facs

    @jax.jit
    def fac_sum_c(v, tabs, lins_a, srcs_a):
        facs = _factor_compact(v, tabs, lins_a, srcs_a)
        return sum(jnp.sum(jnp.abs(f[0])) for f in facs)

    log(f"factor (compact fronts): "
        f"{t_of(lambda: fac_sum_c(vals, nd.tabs, lins, srcs), reps=3)*1000:.1f} ms")
    a = float(jax.device_get(fac_sum(vals, nd.tabs)))
    b = float(jax.device_get(fac_sum_c(vals, nd.tabs, lins, srcs)))
    log(f"  checksum dense={a:.6e} compact={b:.6e}")


if __name__ == "__main__":
    main()
