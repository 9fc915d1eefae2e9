"""TPU batch 3: blocked-LU NDLU on the bench cavity.

(A) NDLU micro: symbolic, factor (blocked lu_block=128), apply, refinement
    trajectory on the it-0 Jacobian.
(B) tpu_direct full Newton solve (fresh factor per iteration) — the bench
    candidate.
(C) ndlu-preconditioned GMRES (fresh factor, EW forcing) for comparison.

One process; warm every jitted path before timing (axon remote compiles are
minutes-slow and bypass the persistent cache). Output unbuffered to stderr.
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import os

    cpu = "--cpu" in sys.argv
    if cpu:
        sys.argv.remove("--cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
    lax_cmp = "--lax-compare" in sys.argv
    if lax_cmp:
        sys.argv.remove("--lax-compare")
    import jax

    if cpu:
        # the axon sitecustomize re-registers the TPU plugin and resets
        # jax_platforms; override after import as well (conftest pattern)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver
    from goma_tpu.solvers.ndlu import NDLU, zero_diag_defer_mask

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(n)
    prob.jacobian_dtype = jnp.float32
    params = prob.base_params()
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                      linear_solver="tpu_direct", ndlu_leaf_max=leaf,
                      ndlu_refine=2),
    )

    # ---- (A) micro
    t0 = time.perf_counter()
    R, vals, norms, scale, aux = solver._prep(x0, params)
    jax.block_until_ready(vals)
    log(f"prep compile+run: {time.perf_counter()-t0:.0f}s")

    defer = zero_diag_defer_mask(prob.pattern, jax.device_get(vals))
    t0 = time.perf_counter()
    nd = NDLU(prob.pattern, leaf_max=leaf, dtype=jnp.float32,
              front_lu="pallas", defer_dofs=defer)
    log(f"symbolic+tables: {time.perf_counter()-t0:.0f}s "
        f"(levels={len(nd.levels)}, "
        f"fronts={[ (l.nn, l.smax, l.bmax) for l in nd.levels[:3] ]}...)")

    t0 = time.perf_counter()
    fac = jax.block_until_ready(nd.factor(vals))
    log(f"pallas factor compile+run: {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(5):
        fac = jax.block_until_ready(nd.factor(vals))
    t_fac = (time.perf_counter() - t0) / 5 * 1000
    log(f"pallas factor: {t_fac:.1f} ms")

    if lax_cmp:
        nd_lax = NDLU(prob.pattern, leaf_max=leaf, dtype=jnp.float32,
                      front_lu="lax", lu_block=128, defer_dofs=defer)
        fl = jax.block_until_ready(nd_lax.factor(vals))
        t0 = time.perf_counter()
        for _ in range(3):
            fl = jax.block_until_ready(nd_lax.factor(vals))
        log(f"blocked-lax factor: {(time.perf_counter()-t0)/3*1000:.0f} ms")

    bD = scale * R
    z = jax.block_until_ready(nd.solve(fac, bD))
    t0 = time.perf_counter()
    for _ in range(5):
        z = jax.block_until_ready(nd.solve(fac, bD))
    t_app = (time.perf_counter() - t0) / 5 * 1000
    log(f"apply: {t_app:.1f} ms")

    mv = solver._matvec(vals)
    xr = nd.solve(fac, bD).astype(bD.dtype)
    for k in range(4):
        rel = float(jnp.linalg.norm(bD - solver._ell.matvec(vals, xr))
                    / jnp.linalg.norm(bD))
        log(f"refine {k}: rel {rel:.2e}")
        r = bD - mv(xr)
        xr = xr + nd.solve(fac, r).astype(bD.dtype)

    # ---- (B) tpu_direct full Newton solve (reuse the SAME NDLU instance so
    # the factor/solve jits stay warm)
    solver._ndlu = nd
    t0 = time.perf_counter()
    rw = solver.solve(x0, params)
    log(f"tpu_direct: warmup {time.perf_counter()-t0:.0f}s iters={rw.iters} "
        f"conv={rw.converged}")
    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"tpu_direct: {tt/it*1000:.0f} ms/iter (asm "
        f"{res.assembly_time/it*1000:.0f} + slv "
        f"{res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"conv={res.converged} total {tt:.2f}s")

    # ---- (C) ndlu-preconditioned GMRES, fresh factor each iteration
    solver2 = NewtonSolver(
        prob,
        NewtonOptions(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                      precond="ndlu", ndlu_leaf_max=leaf, precond_lag=False,
                      gmres_restart=20, linear_maxiter=60),
    )
    solver2.precond = nd  # reuse warm jits
    t0 = time.perf_counter()
    rw = solver2.solve(x0, params)
    log(f"ndlu-gmres: warmup {time.perf_counter()-t0:.0f}s iters={rw.iters} "
        f"lin={rw.linear_iters} conv={rw.converged}")
    t0 = time.perf_counter()
    res = solver2.solve(x0, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"ndlu-gmres: {tt/it*1000:.0f} ms/iter (asm "
        f"{res.assembly_time/it*1000:.0f} + slv "
        f"{res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged} total {tt:.2f}s")


if __name__ == "__main__":
    main()
