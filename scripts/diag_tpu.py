"""Stepwise TPU diagnosis of the profile_prep hang: print progress at
every stage, unbuffered."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    log(f"backend {jax.default_backend()}")
    import numpy as np

    from __graft_entry__ import _cavity_problem

    log("building problem n=64 ...")
    t0 = time.time()
    prob = _cavity_problem(64)
    log(f"finalize done {time.time()-t0:.0f}s (device tables put)")
    prob.jacobian_dtype = jnp.float32

    from goma_tpu.fem import fastns

    T = prob._tables
    FT = {k: T[f"{k}0"] for k in ("fns:gphi", "fns:gpsi", "fns:w")}
    g = T["g0"]
    meta, static = prob._fast_meta[0], prob._fast_static[0]
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    params = prob.base_params()
    xg = x[g]
    hg = params["hist"][g]
    jax.block_until_ready(xg)
    log("gathers done; compiling fast kernel f32 ...")
    t0 = time.time()
    f32 = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                 jnp.float32))
    r, J = f32(xg, hg)
    jax.block_until_ready(J)
    log(f"fast f32 rj compiled+ran {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(20):
        r, J = f32(xg, hg)
    jax.block_until_ready(J)
    log(f"fast f32 rj: {(time.time()-t0)/20*1000:.2f} ms")

    log("compiling fast f64 residual ...")
    t0 = time.time()
    f64r = jax.jit(lambda q, h: fastns.ns_q2q1_rj(q, h, FT, meta, static, 0.0,
                                                  jnp.float64,
                                                  with_jac=False)[0])
    rr = f64r(xg, hg)
    jax.block_until_ready(rr)
    log(f"fast f64 r compiled+ran {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(20):
        rr = f64r(xg, hg)
    jax.block_until_ready(rr)
    log(f"fast f64 r: {(time.time()-t0)/20*1000:.2f} ms")

    log("building NewtonSolver (twolevel host setup) ...")
    t0 = time.time()
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    solver = NewtonSolver(
        prob, NewtonOptions(max_iter=12, tol_residual=1e-6, linear_tol=1e-4,
                            gmres_restart=240, linear_maxiter=480,
                            precond="twolevel", smooth_sweeps=2))
    log(f"solver setup {time.time()-t0:.0f}s; compiling _prep ...")
    t0 = time.time()
    out = solver._prep(x, params)
    jax.block_until_ready(out[0])
    log(f"_prep compiled+ran {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(10):
        out = solver._prep(x, params)
    jax.block_until_ready(out[0])
    log(f"_prep: {(time.time()-t0)/10*1000:.1f} ms")


if __name__ == "__main__":
    main()
