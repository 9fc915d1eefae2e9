"""TPU experiment: tpu_direct (NDLU) vs twolevel Krylov on the 64x64 cavity.

Run in ONE process; warm every jitted path before timing (axon remote
compiles are minutes-slow and bypass the persistent cache)."""

import time
import sys

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    log(f"devices: {jax.devices()}")
    n = 64
    prob = _cavity_problem(n)
    prob.jacobian_dtype = jnp.float32
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    params = prob.base_params()

    # --- tpu_direct path
    for leaf in (96, 192):
        t0 = time.perf_counter()
        solver = NewtonSolver(
            prob,
            NewtonOptions(max_iter=20, tol_residual=1e-6,
                          linear_solver="tpu_direct", ndlu_leaf_max=leaf,
                          ndlu_refine=2),
        )
        res = solver.solve(x0, params)
        tw = time.perf_counter() - t0
        log(f"ndlu[leaf={leaf}]: warmup {tw:.0f}s iters={res.iters} "
            f"conv={res.converged}")
        solver._fac_cache = None
        t0 = time.perf_counter()
        res = solver.solve(x0, params)
        tt = time.perf_counter() - t0
        it = max(res.iters, 1)
        log(f"ndlu[leaf={leaf}]: {tt/it*1000:.0f} ms/iter "
            f"(asm {res.assembly_time/it*1000:.0f} + slv "
            f"{res.solve_time/it*1000:.0f}) iters={res.iters} "
            f"conv={res.converged} total {tt:.2f}s")


if __name__ == "__main__":
    main()
