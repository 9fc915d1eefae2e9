"""Front-assembly timing, round 2: checksum-forced (every level's output
feeds the timed scalar), plus end-to-end factor comparison."""

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
    from goma_tpu.solvers.twolevel import _saddle_mask

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    _, vals, _ = prob._assemble_with_elem(x, params)
    vals = vals.astype(jnp.float32)

    for tag, nd in [
        ("plain", NDLU(prob.pattern, leaf_max=192, dtype=jnp.float32,
                       invert=True)),
        ("defer", NDLU(prob.pattern, leaf_max=192, dtype=jnp.float32,
                       invert=True, defer_dofs=_saddle_mask(prob))),
    ]:
        vals_ext = jnp.concatenate([jnp.zeros(1, jnp.float32), vals])

        @jax.jit
        def dense_arg(ve, tabs):
            s = jnp.zeros((), jnp.float32)
            for tb in tabs:
                s = s + jnp.sum(ve[tb["gmap_a"]])
            return s

        tA = t_of(lambda: dense_arg(vals_ext, nd.tabs))
        log(f"[{tag}] A dense-gmap ARG (checksummed): {tA*1000:.1f} ms")

        lins = [jax.device_put(lv.a_lin.astype(np.int32)) for lv in nd.levels]
        srcs = [jax.device_put(lv.a_src.astype(np.int32)) for lv in nd.levels]
        shapes = [(lv.nn, lv.smax + lv.bmax) for lv in nd.levels]

        @jax.jit
        def compact_arg(v, lins, srcs):
            s = jnp.zeros((), jnp.float32)
            for (nn, f), lin, src in zip(shapes, lins, srcs):
                Ff = jnp.zeros(nn * f * f, jnp.float32)
                Ff = Ff.at[lin].set(v[src], unique_indices=True)
                s = s + jnp.sum(Ff)
            return s

        tB = t_of(lambda: compact_arg(vals, lins, srcs))
        log(f"[{tag}] B compact scatter ARG (checksummed): {tB*1000:.1f} ms")

        tF = t_of(lambda: nd.factor(vals)[0][0], reps=3)
        log(f"[{tag}] factor end-to-end: {tF*1000:.1f} ms")

    # factor with the compact-scatter front assembly monkey-patched in
    nd = NDLU(prob.pattern, leaf_max=192, dtype=jnp.float32, invert=True,
              defer_dofs=_saddle_mask(prob))
    lins = [jax.device_put(lv.a_lin.astype(np.int32)) for lv in nd.levels]
    srcs = [jax.device_put(lv.a_src.astype(np.int32)) for lv in nd.levels]
    shapes = [(lv.nn, lv.smax + lv.bmax) for lv in nd.levels]

    import types

    def _factor_compact(self, vals, tabs):
        vals32 = vals.astype(self.dtype)
        facs = []
        S_prev = None
        hi = jax.lax.Precision.HIGHEST
        for li, (lev, tb) in enumerate(zip(self.levels, tabs)):
            nn, f = shapes[li]
            Ff = jnp.zeros(nn * f * f, self.dtype)
            F = Ff.at[lins[li]].set(vals32[srcs[li]],
                                    unique_indices=True).reshape(nn, f, f)
            if S_prev is not None and tb["p0"] is not None:
                for P, idx in ((tb["p0"], tb["i0"]), (tb["p1"], tb["i1"])):
                    Sc = S_prev[idx].astype(self.dtype)
                    F = F + jnp.einsum("qfa,qab,qgb->qfg", P, Sc, P,
                                       precision=hi)
            if lev.pad_node.shape[0]:
                F = F.at[tb["pad_node"], tb["pad_slot"],
                         tb["pad_slot"]].add(1.0)
            s = lev.smax
            A11 = F[:, :s, :s]
            from goma_tpu.solvers.pallas_lu import batched_lu

            lu = batched_lu(A11, pivot_tol=self.pivot_tol,
                            interpret=self._pl_interpret)
            m = lu.shape[-1]
            eye = jnp.broadcast_to(jnp.eye(m, dtype=self.dtype),
                                   (lev.nn, m, m))
            from goma_tpu.solvers.ndlu import triangular_solve

            fwd = triangular_solve(lu, eye, left_side=True, lower=True,
                                   unit_diagonal=True)
            bwd = triangular_solve(lu, eye, left_side=True, lower=False)
            if lev.bmax:
                A12 = F[:, :s, s:]
                A21 = F[:, s:, :s]
                A22 = F[:, s:, s:]
                Y = fwd @ A12
                X = A21 @ bwd
                S_prev = A22 - X @ Y
            else:
                X = jnp.zeros((lev.nn, 0, m), self.dtype)
                Y = jnp.zeros((lev.nn, m, 0), self.dtype)
                S_prev = jnp.zeros((lev.nn, 0, 0), self.dtype)
            facs.append((fwd, bwd, None, X, Y))
        return facs

    fac_jit = jax.jit(lambda v: _factor_compact(nd, v, nd.tabs))
    tFC = t_of(lambda: fac_jit(vals)[0][0], reps=3)
    log(f"[defer] factor with compact-scatter fronts: {tFC*1000:.1f} ms")
    # numeric check vs reference factor
    f_ref = nd.factor(vals)
    f_new = fac_jit(vals)
    err = max(float(jnp.max(jnp.abs(a[0] - b[0]))) for a, b in
              zip(f_ref, f_new))
    log(f"  max |fwd_ref - fwd_new| = {err:.2e}")


if __name__ == "__main__":
    main()
