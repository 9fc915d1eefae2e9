"""TPU batch: full 64x64-cavity Newton solves under candidate solver
configs (one process; warmup solve before the timed solve per config)."""

import sys
import time

import numpy as np


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
    if hasattr(solver, "_recycle_U"):
        solver._recycle_U = None
    t0 = time.perf_counter()
    res = solver.solve(x, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    log(f"{tag}: {tt/it*1000:.0f} ms/iter (asm {res.assembly_time/it*1000:.0f}"
        f" slv {res.solve_time/it*1000:.0f}) iters={res.iters} "
        f"lin={res.linear_iters} conv={res.converged} total {tt:.2f}s")
    del solver


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    log(f"devices: {jax.devices()}")
    run("preonly", smooth_post_sweeps=0)
    run("preonly+dr20", smooth_post_sweeps=0, recycle_k=20)
    run("ndlu-pre", precond="ndlu", ndlu_leaf_max=192, gmres_restart=30,
        linear_maxiter=120)


if __name__ == "__main__":
    main()
