"""TPU batch 2: (A) ndlu-preconditioned full Newton solve on the bench
cavity — the key config; (B) twolevel + GCRO-DR recycling; (C) dense-front
factorization microbenchmarks. One process; important config first."""

import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(tag, **kw):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    opts = dict(max_iter=20, tol_residual=1e-6, linear_tol=1e-4,
                gmres_restart=240, linear_maxiter=480, precond="twolevel",
                smooth_sweeps=1)
    opts.update(kw)
    solver = NewtonSolver(prob, NewtonOptions(**opts))
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    t0 = time.perf_counter()
    rw = solver.solve(x, params)
    log(f"{tag}: warmup {time.perf_counter()-t0:.0f}s iters={rw.iters} "
        f"lin={rw.linear_iters} conv={rw.converged}")
    solver._fac_cache = None
    solver._recycle_U = None
    t0 = time.perf_counter()
    res = solver.solve(x, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"{tag}: {tt/it*1000:.0f} ms/iter (asm {res.assembly_time/it*1000:.0f}"
        f" slv {res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged} total {tt:.2f}s")
    del solver


def micro():
    import jax
    import jax.numpy as jnp
    from jax.lax.linalg import lu, triangular_solve

    def bench(f, *a, reps=10):
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / reps * 1000

    key = jax.random.PRNGKey(0)
    for nn, s in [(188, 361), (16, 867), (1, 561)]:
        A = jax.random.normal(key, (nn, s, s), jnp.float32) + \
            10.0 * jnp.eye(s, dtype=jnp.float32)[None]
        B = jax.random.normal(key, (nn, s, 128), jnp.float32)
        t_lu = bench(jax.jit(lambda A: lu(A)[0]), A)
        t_ts = bench(jax.jit(lambda A, B: triangular_solve(
            A, B, left_side=True, lower=True, unit_diagonal=True)), A, B)
        t_mm = bench(jax.jit(lambda A, B: A @ B), A, B)
        t_inv = bench(jax.jit(lambda A: jnp.linalg.inv(A)), A)

        def blocked(A):
            h = A.shape[-1] // 2
            lu1 = lu(A[:, :h, :h])[0]
            Y = triangular_solve(lu1, A[:, :h, h:], left_side=True,
                                 lower=True, unit_diagonal=True)
            X = triangular_solve(lu1, A[:, h:, :h], left_side=False,
                                 lower=False)
            S = A[:, h:, h:] - X @ Y
            return lu1, lu(S)[0], X, Y
        t_bl = bench(jax.jit(blocked), A)
        log(f"micro ({nn},{s}): lu {t_lu:.1f} tri {t_ts:.1f} mm {t_mm:.2f} "
            f"inv {t_inv:.1f} blocked2 {t_bl:.1f} ms")


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    log(f"devices: {jax.devices()}")
    run("ndlu-pre", precond="ndlu", ndlu_leaf_max=192, gmres_restart=30,
        linear_maxiter=120)
    micro()
    run("twolevel+dr24", recycle_k=24)


if __name__ == "__main__":
    main()
