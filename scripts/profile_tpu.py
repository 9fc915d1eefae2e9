"""TPU microbenchmark of the Newton-Krylov hot-path pieces (cavity 64x64).

Times each jitted piece separately on the real chip so tuning decisions are
data-driven rather than guessed. Batch-run: ONE process pays all compiles.
Run:  timeout 1700 python scripts/profile_tpu.py
"""

import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, n=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    n = 64
    prob = _cavity_problem(n)
    prob.jacobian_dtype = jnp.float32
    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-6, linear_tol=1e-4,
                      gmres_restart=240, linear_maxiter=480, precond="twolevel",
                      smooth_sweeps=2),
    )
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    results = {}

    # ---- 1. full _prep (assembly + scale + norms), current mixed f64/f32
    t0 = time.perf_counter()
    R, vals, norms, scale, aux = solver._prep(x, params)
    jax.block_until_ready(R)
    log(f"compile _prep: {time.perf_counter()-t0:.0f}s")
    results["prep_mixed"] = timeit(lambda: solver._prep(x, params), n=10)

    # ---- 2. residual-only f64 pass (vmap + segment_sum), isolated
    T = prob._tb(params)

    def res_pass(xv, params, dtype):
        n_dof = prob.dofmap.n_dof
        Rl = jnp.zeros(n_dof, dtype=dtype)
        xv = xv.astype(dtype)
        hist = params["hist"].astype(dtype)
        pj = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            params)
        for bi in range(len(prob.dofmap.blocks)):
            gather = T[f"g{bi}"]
            Xref = T[f"x{bi}"].astype(dtype)
            conn = T[f"c{bi}"]
            ext = prob._ext_gather(pj, conn).astype(dtype)
            elem_res = prob._elem_residual_fn(bi, dtype)
            r, _ = jax.vmap(elem_res, in_axes=(0, 0, 0, 0, None, None))(
                xv[gather], hist[gather], Xref, ext, 1.0, pj)
            Rl = Rl + jax.ops.segment_sum(r.reshape(-1), gather.reshape(-1),
                                          num_segments=n_dof)
        return Rl

    res64 = jax.jit(lambda xv, p: res_pass(xv, p, jnp.float64))
    res32 = jax.jit(lambda xv, p: res_pass(xv, p, jnp.float32))
    t0 = time.perf_counter(); jax.block_until_ready(res64(x, params))
    log(f"compile res64: {time.perf_counter()-t0:.0f}s")
    results["residual_f64"] = timeit(lambda: res64(x, params), n=10)
    t0 = time.perf_counter(); jax.block_until_ready(res32(x, params))
    log(f"compile res32: {time.perf_counter()-t0:.0f}s")
    results["residual_f32"] = timeit(lambda: res32(x, params), n=10)

    # ---- 3. jacfwd f32 pass (J only, no padding)
    def jac_pass(xv, params):
        dtype = jnp.float32
        xv = xv.astype(dtype)
        hist = params["hist"].astype(dtype)
        pj = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            params)
        out = []
        for bi in range(len(prob.dofmap.blocks)):
            gather = T[f"g{bi}"]
            Xref = T[f"x{bi}"].astype(dtype)
            conn = T[f"c{bi}"]
            ext = prob._ext_gather(pj, conn).astype(dtype)
            jac_fn = jax.jacfwd(prob._elem_residual_fn(bi, dtype), argnums=0,
                                has_aux=True)
            J, _ = jax.vmap(jac_fn, in_axes=(0, 0, 0, 0, None, None))(
                xv[gather], hist[gather], Xref, ext, 1.0, pj)
            out.append(J)
        return out

    jacj = jax.jit(jac_pass)
    t0 = time.perf_counter(); jax.block_until_ready(jacj(x, params))
    log(f"compile jac32: {time.perf_counter()-t0:.0f}s")
    results["jacfwd_f32"] = timeit(lambda: jacj(x, params), n=10)

    # ---- 4. pad_aux (one-hot re-index into padded layout)
    padj = jax.jit(lambda a: prob.pad_aux(a, T))
    # aux from _prep above is already padded; rebuild raw aux
    Rv, vals2, aux_raw = prob._assemble_with_elem(x, params)
    t0 = time.perf_counter(); jax.block_until_ready(padj(aux_raw))
    log(f"compile pad_aux: {time.perf_counter()-t0:.0f}s")
    results["pad_aux"] = timeit(lambda: padj(aux_raw), n=10)

    # ---- 5. padded matvec (f32)
    v32 = jnp.asarray(np.random.RandomState(0).rand(prob.dofmap.n_dof),
                      dtype=jnp.float32)
    sc32 = scale.astype(jnp.float32)
    mvj = jax.jit(lambda a, s, v: prob.padded_matvec(None, a, s, v))
    t0 = time.perf_counter(); jax.block_until_ready(mvj(aux, sc32, v32))
    log(f"compile padded_matvec: {time.perf_counter()-t0:.0f}s")
    results["padded_matvec"] = timeit(lambda: mvj(aux, sc32, v32), n=50)

    # ---- 6. preconditioner factor + apply pieces
    fac = solver._factor_jit(vals, solver._ntab, *solver._factor_state(vals))
    jax.block_until_ready(fac)
    results["factor"] = timeit(
        lambda: solver._factor_jit(vals, solver._ntab, *solver._factor_state(vals)),
        n=5)

    tl = solver.precond
    # vanka smoother apply alone
    vkj = jax.jit(lambda f, r: tl.bj.apply(f, r, None))
    t0 = time.perf_counter(); jax.block_until_ready(vkj(fac[0], v32))
    log(f"compile vanka: {time.perf_counter()-t0:.0f}s")
    results["vanka_apply"] = timeit(lambda: vkj(fac[0], v32), n=50)

    # coarse apply alone
    caj = jax.jit(lambda c, rc: tl._coarse_apply(c, rc))
    rc = jnp.asarray(np.random.RandomState(1).rand(tl.nc), dtype=jnp.float32)
    t0 = time.perf_counter(); jax.block_until_ready(caj(fac[1], rc))
    log(f"compile coarse ({tl.nc} dof): {time.perf_counter()-t0:.0f}s")
    results["coarse_apply"] = timeit(lambda: caj(fac[1], rc), n=50)

    # restrict/prolong
    rpj = jax.jit(lambda r: tl.prolong(tl.restrict(r, None), None))
    t0 = time.perf_counter(); jax.block_until_ready(rpj(v32))
    results["restrict+prolong"] = timeit(lambda: rpj(v32), n=50)

    # full twolevel apply (with element matvec inside)
    def tl_apply(vals, scale, aux, fac, r):
        mv = solver._matvec_state(vals, scale, aux, solver._ptab, solver._ntab)
        return solver._apply_precond_mv(mv, vals, solver._ntab, fac, r)

    tlj = jax.jit(tl_apply)
    t0 = time.perf_counter(); jax.block_until_ready(tlj(vals, sc32, aux, fac, v32))
    log(f"compile twolevel apply: {time.perf_counter()-t0:.0f}s")
    results["twolevel_apply"] = timeit(lambda: tlj(vals, sc32, aux, fac, v32), n=30)

    # ---- 7. one GMRES cycle (restart=240, tol such that it runs full 240?)
    # use the real cycle at tight tol on a random rhs: counts its internally
    b32 = v32
    z0 = jnp.zeros_like(b32)
    t0 = time.perf_counter()
    out = solver._cycle_jit(vals, sc32, aux, solver._ptab, solver._ntab, fac,
                           z0, b32, jnp.asarray(1e-10, dtype=jnp.float32))
    jax.block_until_ready(out)
    log(f"compile gmres cycle: {time.perf_counter()-t0:.0f}s")
    t = timeit(lambda: solver._cycle_jit(vals, sc32, aux, solver._ptab,
                                         solver._ntab, fac, z0, b32,
                                         jnp.asarray(1e-10, dtype=jnp.float32)), n=3)
    its = int(jax.device_get(out[2]))
    results["gmres_cycle_total"] = t
    results["gmres_per_it"] = t / max(its, 1)
    log(f"gmres cycle its={its}")

    for k, v in results.items():
        print(f"{k:24s} {v*1000:9.3f} ms")


if __name__ == "__main__":
    main()
