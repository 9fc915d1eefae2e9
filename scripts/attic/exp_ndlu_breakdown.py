"""TPU: NDLU factor/apply time breakdown on the 64x64 cavity Jacobian."""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver
    from goma_tpu.solvers.ndlu import NDLU

    log(f"devices: {jax.devices()}")
    prob = _cavity_problem(64)
    prob.jacobian_dtype = jnp.float32
    solver = NewtonSolver(prob, NewtonOptions())
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    R, vals, norms, scale, aux = solver._prepare(x, params)
    b = (scale * R).astype(jnp.float32)

    for leaf in (192, 384):
        t0 = time.perf_counter()
        nd = NDLU(prob.pattern, leaf_max=leaf, dtype=jnp.float32)
        log(f"leaf={leaf}: symbolic {time.perf_counter()-t0:.1f}s, "
            f"levels={len(nd.levels)} "
            f"fronts={[ (lv.nn, lv.smax, lv.bmax) for lv in nd.levels ]}")
        fac_j = jax.jit(nd.factor)
        slv_j = jax.jit(nd.solve)
        t0 = time.perf_counter()
        fac = jax.block_until_ready(fac_j(vals))
        log(f"leaf={leaf}: factor compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        z = jax.block_until_ready(slv_j(fac, b))
        log(f"leaf={leaf}: solve compile+run {time.perf_counter()-t0:.1f}s")
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            fac = jax.block_until_ready(fac_j(vals))
        tf = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            z = jax.block_until_ready(slv_j(fac, b))
        ts = (time.perf_counter() - t0) / reps
        mv = solver._ell.matvec
        rel = float(jnp.linalg.norm(b - mv(vals, z)) / jnp.linalg.norm(b))
        log(f"leaf={leaf}: factor {tf*1000:.1f} ms, apply {ts*1000:.1f} ms, "
            f"rel={rel:.2e}")


if __name__ == "__main__":
    main()
