"""TPU round-3: where does the cavity gmres+ndlu iteration time go?

Micro-breakdown under bench conditions (x64 residual / f32 Jacobian):
prepare, NDLU factor, one GMRES cycle, single precond-apply and matvec.
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def t_of(fn, reps=10):
    import jax
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


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
    opts = NewtonOptions(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                         precond="ndlu", linear_solver="gmres",
                         gmres_restart=60, linear_maxiter=240,
                         ndlu_leaf_max=192)
    solver = NewtonSolver(prob, opts)
    params = prob.base_params()
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    log("warmup solve (compiles)...")
    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    log(f"warmup {time.perf_counter()-t0:.0f}s iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged}")
    solver._fac_cache = None

    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    t_tot = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"timed: {t_tot:.3f}s / {res.iters} iters = {t_tot/it*1000:.0f} ms/iter "
        f"(asm {res.assembly_time/it*1000:.0f} + slv {res.solve_time/it*1000:.0f})")
    log(f"  lin its: {res.linear_iters}")

    x = jnp.asarray(res.x)
    ell_tb = solver._ntab["ell"]

    # component timings at the converged state — time the jitted prep WITH
    # the ELL tables: that is the production iteration path (the unjitted
    # fallback takes the sym_sum_scale route instead)
    tprep = t_of(lambda: solver._prep(x, params, ell_tb)[1])
    log(f"  _prepare (jit, ELL row sums): {tprep*1000:.1f} ms")
    R, vals, norms, scale, aux = solver._prep(x, params, ell_tb)
    # sub-breakdown of prep: assembly alone, then R+vals without aux combine
    asm_jit = jax.jit(lambda xx, pp: prob._assemble_with_elem(xx, pp)[1])
    tasm0 = t_of(lambda: asm_jit(x, params))
    log(f"  _assemble_with_elem (jit): {tasm0*1000:.1f} ms")
    from goma_tpu.fem.sparsity import row_sums_ell
    rs_jit = jax.jit(lambda vv: row_sums_ell(vv, ell_tb["pos"]))
    trs = t_of(lambda: rs_jit(vals))
    log(f"  row_sums_ell (jit): {trs*1000:.1f} ms")
    tfac = t_of(lambda: solver._factor_jit(vals, solver._ntab,
                                           *solver._factor_state(vals)), reps=3)
    log(f"  NDLU factor: {tfac*1000:.1f} ms")
    fac = solver._factor_jit(vals, solver._ntab, *solver._factor_state(vals))
    b = (scale.astype(R.dtype) * R).astype(vals.dtype)
    z0 = jnp.zeros_like(b)
    tol = jnp.asarray(1e-4, dtype=b.dtype)
    ptab = solver._ptab if solver._use_elem_mv else None
    tcyc = t_of(lambda: solver._cycle_jit(vals, scale, aux, ptab, solver._ntab,
                                          fac, z0, b, tol)[0])
    cnt = int(solver._cycle_jit(vals, scale, aux, ptab, solver._ntab,
                                fac, z0, b, tol)[2])
    log(f"  one GMRES cycle: {tcyc*1000:.1f} ms ({cnt} live its -> "
        f"{tcyc/max(cnt,1)*1000:.1f} ms/it)")

    # single apply / matvec
    mv = solver._matvec_state(vals, scale, aux, ptab, solver._ntab)
    bf = b
    tapply = t_of(lambda: solver._apply_precond_mv(mv, vals, solver._ntab,
                                                   fac, bf))
    log(f"  one precond apply: {tapply*1000:.2f} ms")
    tmv = t_of(lambda: mv(bf))
    log(f"  one operator matvec: {tmv*1000:.2f} ms")

    # assembly alone (no scaling/norms)
    tasm = t_of(lambda: prob._assemble_with_elem(x, params)[1])
    log(f"  _assemble_with_elem: {tasm*1000:.1f} ms")


if __name__ == "__main__":
    main()
