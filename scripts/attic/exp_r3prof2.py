"""TPU round-3 probe #2: fast-prep internals + NDLU factor per-stage costs.

Times on the 64x64 cavity (bench conditions): the fast-prep jit and its
pieces (element R+J, rs combine, pad_aux, norms), deferred vals, and the
multifrontal factor broken into per-level gather / extend-add / LU / panel
/ Schur stages.
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def t_of(fn, reps=10):
    import jax
    jax.block_until_ready(fn())  # warm/compile
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

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    opts = NewtonOptions(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                         precond="ndlu", linear_solver="gmres",
                         gmres_restart=60, linear_maxiter=240,
                         ndlu_leaf_max=192)
    solver = NewtonSolver(prob, opts)
    params = prob.base_params()
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    assert solver._fast_prep

    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    log(f"warmup {time.perf_counter()-t0:.0f}s iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged}")
    x = jnp.asarray(res.x)

    # ---- fast prep total + pieces
    tfp = t_of(lambda: solver._fastprep_jit(x, params)[0])
    log(f"fastprep total: {tfp*1000:.1f} ms")
    T = prob._tb(params)
    rj = jax.jit(lambda xx, pp: prob._elem_rj_parts(xx, pp, prob._tables))
    trj = t_of(lambda: rj(x, params)[1][0])
    log(f"  elem R+J parts: {trj*1000:.1f} ms")
    af = jax.jit(prob._assemble_fast)
    taf = t_of(lambda: af(x, params)[1])
    log(f"  _assemble_fast (R+rs+aux): {taf*1000:.1f} ms")
    # pad_aux on its own
    _, rs, aux = af(x, params)
    if solver._use_padded:
        pj = jax.jit(lambda a: prob.pad_aux(a, prob._tables))
        tpad = t_of(lambda: pj(aux)[0][0])
        log(f"  pad_aux: {tpad*1000:.1f} ms")
    # deferred vals
    R, norms, scale, auxp = solver._fastprep_jit(x, params)
    tval = t_of(lambda: solver._vals_jit(x, params, scale), reps=5)
    log(f"  deferred _scaled_vals: {tval*1000:.1f} ms")

    # ---- NDLU factor stage costs
    vals = solver._vals_jit(x, params, scale)
    nd = solver.precond
    levels, tabs = nd.levels, nd.tabs
    log(f"NDLU: {len(levels)} levels; "
        + "; ".join(f"L{i}: nn={lv.nn} s={lv.smax} b={lv.bmax}"
                    for i, lv in enumerate(levels)))
    tfac = t_of(lambda: solver._factor_jit(vals, solver._ntab,
                                           *solver._factor_state(vals)),
                reps=3)
    log(f"factor total: {tfac*1000:.1f} ms")

    dtp = nd.dtype
    vals_ext = jnp.concatenate([jnp.zeros(1, dtp), vals.astype(dtp)])

    @jax.jit
    def gathers(ve, tb_all):
        return [ve[tb["gmap_a"]] for tb in tb_all]

    tg = t_of(lambda: gathers(vals_ext, nd.tabs)[0], reps=5)
    log(f"  all-level F gathers: {tg*1000:.1f} ms")

    # per-level LU + panels: factor with gathers replaced by ready Fs
    Fs = gathers(vals_ext, nd.tabs)
    from goma_tpu.solvers.pallas_lu import batched_lu

    for i, (lv, F) in enumerate(zip(levels, Fs)):
        s = lv.smax
        A11 = F[:, :s, :s]
        if 1 < s <= 1000:
            tl = t_of(lambda A=A11: batched_lu(A, pivot_tol=nd.pivot_tol,
                                               interpret=nd._pl_interpret),
                      reps=3)
            log(f"  L{i} pallas_lu(nn={lv.nn}, s={s}): {tl*1000:.1f} ms")

    # extend-add einsum cost at the first interior level with children
    hi = jax.lax.Precision.HIGHEST
    for i, (lv, tb) in enumerate(zip(levels, nd.tabs)):
        if tb["p0"] is not None:
            cb = levels[i - 1].bmax
            Sc = jnp.zeros((lv.nn, cb, cb), dtp)

            def ea(P=tb["p0"], S=Sc):
                return jnp.einsum("qfa,qab,qgb->qfg", P, S, P, precision=hi)

            te = t_of(jax.jit(ea), reps=3)
            f = lv.smax + lv.bmax
            log(f"  L{i} extend-add (nn={lv.nn}, f={f}, cb={cb}): "
                f"{te*1000:.1f} ms x2")


if __name__ == "__main__":
    main()
