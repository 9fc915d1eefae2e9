"""Benchmark: assembly+solve seconds per Newton iteration (BASELINE metric).

Headline (config #1): the 64x64 Q2/Q1 lid-driven-cavity Navier-Stokes deck
on the default JAX backend (TPU under the driver) — the reference's
``asmslv`` metric (``src/mm_sol_nonlinear.c`` assembly/solve timers), with
``vs_baseline`` = speedup over a 1-core reference-style iteration (C++ -O3
scalar element assembly + SuperLU direct solve on this host).

Self-protecting (r5 rework of the r4 orchestration that lost the run —
BENCH_r04 was rc=124 with zero configs recorded while the TPU tunnel was
down):

- budget (``GOMA_BENCH_BUDGET_S``) defaults to 1700 s, UNDER the driver's
  ~1800 s wall; the SIGALRM backstop fires at budget+60;
- a cheap TPU *canary* child (device init + tiny matmul) runs before the
  first config and after any hang; while it fails the parent polls it on a
  short cycle instead of sleeping blind, and if the TPU never answers each
  unfinished config records ``{"tpu_unreachable": true}``;
- configs run in child-process GROUPS with hard wall timeouts (a wedged
  TPU call can't block signal handlers); each child emits one ``@@RESULT``
  line per config as it completes, so a timeout kill still harvests every
  finished config and the in-flight one is recorded as hung BEFORE any
  wait (grouping matters: every fresh process pays a 45-115 s TPU grant);
- the headline ``cavity_ns`` runs in the FIRST group, with the
  ``asm_element`` microbench (the BASELINE ">=20x assembly per element"
  north star) beside it; the cumulative summary is flushed to
  ``BENCH_PARTIAL.json`` after every record and SIGTERM/SIGALRM print the
  final cumulative JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
"""

import json
import os
import signal
import sys
import time

import numpy as np

T0 = time.perf_counter()
# default budget sits UNDER the driver's ~1800 s wall (BENCH_r04 died by
# external SIGTERM at 1798 s with the soft gates calibrated to 3000)
BUDGET = float(os.environ.get("GOMA_BENCH_BUDGET_S", "1700"))

SUMMARY = {
    "metric": "",
    "value": None,
    "unit": "s/iter",
    "vs_baseline": None,
    "configs": {},
}


def log(msg):
    print(f"[{time.perf_counter()-T0:6.0f}s] {msg}", file=sys.stderr,
          flush=True)


def elapsed():
    return time.perf_counter() - T0


def remaining():
    return BUDGET - elapsed()


def emit(final=False):
    """Flush the cumulative summary; on final, print the ONE JSON line.
    Children never touch the parent's BENCH_PARTIAL.json / stdout line."""
    if os.environ.get("GOMA_BENCH_CHILD"):
        return
    line = json.dumps(SUMMARY)
    try:
        with open("BENCH_PARTIAL.json", "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    if final:
        print(line, flush=True)


def _die(signum, frame):
    SUMMARY["configs"]["_interrupted"] = {
        "signal": int(signum), "elapsed_s": round(elapsed(), 1)}
    emit(final=True)
    os._exit(0)


signal.signal(signal.SIGTERM, _die)
signal.signal(signal.SIGALRM, _die)
signal.alarm(max(int(BUDGET) + 60, 60))  # backstop behind the soft gates


def record(name, value):
    SUMMARY["configs"][name] = value
    emit()
    log(f"bench[{name}]: {value}")


def gate(name, est_s):
    """Budget gate: skip a config whose estimated cost exceeds what's left."""
    if remaining() < est_s:
        record(name, {"skipped": f"budget ({remaining():.0f}s left, "
                                 f"est {est_s:.0f}s)"})
        return False
    return True


# ----------------------------------------------------- assembly microbench
def bench_assembly_micro(n=64, loops=32):
    """Element residual+Jacobian throughput, TPU vs one x86 core on the SAME
    work (the NS Q2/Q1 cavity element kernel; BASELINE ">=20x assembly per
    element" north star; VERDICT r3 item 2a).

    Two TPU numbers:
    - ``tpu_elem_us_looped``: per-element time of the full assembly pass
      (residual + AD element Jacobians + row sums + BC surgery) from a
      lax.scan of ``loops`` data-dependent iterations inside ONE dispatch —
      pure device throughput, no host/tunnel round trips;
    - ``tpu_prep_ms_single``: ONE dispatch of the same pass including the
      host round trip — what the Newton loop's per-iteration "asm" bucket
      actually pays (the r03 55 ms-vs-"0.1 ms" contradiction is dispatch
      latency attribution, not element-kernel time).
    """
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.native import ref_assembly_seconds_per_element

    prob = _cavity_problem(n)
    prob.jacobian_dtype = jnp.float32
    ne = prob.mesh.n_elem
    params = prob.base_params()
    f32 = jnp.float32

    @jax.jit
    def one(x, p):
        # x' = x + eps R chains consecutive calls through a data
        # dependency, so pipelined dispatches cannot be elided; eps is tiny
        # (not 0.0 — the algebraic simplifier folds mul-by-zero)
        R, rs, aux = prob._assemble_fast(x, p, rdt=f32)
        return x + jnp.float32(1e-30) * R.astype(f32), rs

    @jax.jit
    def looped(x, p):
        def body(c, _):
            R, rs, _ = prob._assemble_fast(c, p, rdt=f32)
            return c + jnp.float32(1e-30) * R.astype(c.dtype), rs[0]
        c, outs = jax.lax.scan(body, x, None, length=loops)
        return c[0], outs

    x = jnp.zeros(prob.dofmap.n_dof, dtype=f32)
    # warmups (compile)
    jax.device_get(one(x, params)[0][:1])
    jax.device_get(looped(x, params)[0])
    # timed: K chained dispatches drained by ONE fetch (block_until_ready
    # through the remote tunnel is fire-and-forget; only a data fetch
    # actually waits — measured 0.03 ms vs 30 ms)
    K = loops
    t0 = time.perf_counter()
    xx = x
    for _ in range(K):
        xx, rs = one(xx, params)
    _ = jax.device_get(xx[:1])
    t_chain = (time.perf_counter() - t0) / K
    # timed: device-resident scan inside ONE dispatch (no per-call overhead)
    t0 = time.perf_counter()
    c0, outs = looped(x, params)
    _ = jax.device_get(c0)
    t_loop = (time.perf_counter() - t0) / loops

    t_ref = ref_assembly_seconds_per_element()
    if t_ref is None:
        t_ref = 14e-3 / 4096
    best = min(t_loop, t_chain)

    # ---- FLOP/byte accounting (analytic, per element, f32 pass) ----
    # counted from the fastns formulation: linear residual matvec 2*nl^2,
    # convection residual ~1.4k, convection J blocks ~9k (the qabe,qij
    # GEMM dominates), row sums nl^2; table reads Kfix nl^2 + gphi
    # nq*nbu*2 + w nq, J write nl^2, q/r/rs vectors.
    nl, nq, nbu = 22, 9, 9
    flops_pe = (2 * nl * nl                      # Kfix . q
                + 1390 + 9000                    # convection R + J blocks
                + nl * nl)                       # |row| sums
    bytes_pe = 4 * (nl * nl + nq * nbu * 2 + nq  # table reads
                    + nl * nl                    # J write
                    + 6 * nl)                    # q, hist, r, rs traffic
    sec = best
    gflops = flops_pe * ne / sec / 1e9
    gbs = bytes_pe * ne / sec / 1e9
    # v5e peak: ~197 TFLOP/s bf16 MXU, ~819 GB/s HBM
    out = {
        "n_elem": ne,
        "tpu_elem_us": round(best / ne * 1e6, 4),
        "tpu_pass_ms_scan": round(t_loop * 1e3, 3),
        "tpu_pass_ms_chained": round(t_chain * 1e3, 3),
        "ref_elem_us_1core": round(t_ref * 1e6, 3),
        "vs_baseline": round(t_ref / (best / ne), 2),
        "flops_per_elem": flops_pe,
        "bytes_per_elem": bytes_pe,
        "achieved_gflops": round(gflops, 2),
        "achieved_gbs": round(gbs, 2),
        "mfu_pct_bf16peak": round(gflops / 197e3 * 100, 4),
        "hbm_pct": round(gbs / 819 * 100, 2),
        "bound": "latency/gather-bound: scalar-gather floor ~9-12 ns per "
                 "gathered scalar dominates (element dof gather + "
                 "transpose-gather combine); neither HBM bandwidth nor "
                 "MXU/VPU compute is near saturation — see "
                 "docs/PERFORMANCE.md ceiling analysis",
        "note": "vs_baseline = 1-core C++ -O3 element R+J time / TPU "
                "per-element time of the full batched assembly pass "
                "(residual + exact element Jacobians [precomputed linear "
                "part + MXU-GEMM convection] + row sums + BC surgery)",
    }
    return out


def bench_assembly_micro_sweep():
    """The per-element north star at small AND production batch: a 64x64
    deck (4k elements) underfills the TPU — per-element time is dominated
    by fixed pass overheads; the 192x192 deck (36.9k elements) is the
    representative production batch. The headline vs_baseline is the
    large-batch number (BASELINE ">=20x assembly per element")."""
    out = {"b4096": bench_assembly_micro(n=64, loops=32)}
    if remaining() > 240:
        big = bench_assembly_micro(n=192, loops=8)
        out["b36864"] = big
        out["vs_baseline"] = big["vs_baseline"]
        out["tpu_elem_us"] = big["tpu_elem_us"]
    else:
        out["vs_baseline"] = out["b4096"]["vs_baseline"]
        out["tpu_elem_us"] = out["b4096"]["tpu_elem_us"]
    return out


# --------------------------------------------------------------- config #1
def _time_cavity_solver(prob, opts, tag):
    """Warmup + timed full Newton solve; returns (sec_per_iter, res)."""
    import jax.numpy as jnp

    from goma_tpu.solvers import NewtonSolver

    solver = NewtonSolver(prob, opts)
    params = prob.base_params()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    log(f"bench[cavity:{tag}]: warmup full solve (compiles everything)...")
    t0 = time.perf_counter()
    res_w = solver.solve(x, params)
    tw = time.perf_counter() - t0
    log(f"bench[cavity:{tag}]: warmup {tw:.0f}s "
        f"(iters={res_w.iters}, lin={res_w.linear_iters})")
    solver.reset_lagged()
    t0 = time.perf_counter()
    res = solver.solve(x, params)
    t_total = time.perf_counter() - t0
    iters = max(res.iters, 1)
    sec_per_iter = t_total / iters
    log(f"bench[cavity:{tag}]: iters={res.iters} conv={res.converged} "
        f"lin={res.linear_iters}")
    log(f"bench[cavity:{tag}]: asm {res.assembly_time/iters*1000:.0f} ms + "
        f"slv {res.solve_time/iters*1000:.0f} ms = "
        f"{sec_per_iter*1000:.0f} ms/iter (total {t_total:.2f}s)")
    return sec_per_iter, res, t_total, tw


def _cavity_opts(kind, tol=1e-6, max_iter=20):
    from goma_tpu.solvers import NewtonOptions

    if kind == "gmres+ndlu":
        # prep32: far-from-solution iterations run the whole prep at f32
        # (the f64 residual is software-emulated on TPU and dominates the
        # assembly bucket); the endgame re-preps and converges in f64.
        # Deep-convergence configs (tol < 1e-8): NEWTON is the
        # mixed-precision refinement loop — keep every f32 Krylov solve
        # LOOSE (eta floor 1e-3, classic EW oversolving safeguard) and
        # take a few extra quadratic/linear Newton steps with f64
        # residuals instead of grinding 120-240-iteration f32 solves
        # against their roundoff floor (r5-measured: 2.33 -> ~0.2 s/iter)
        deep = tol < 1e-8
        return NewtonOptions(max_iter=max_iter, tol_residual=tol,
                             linear_tol=1e-4, precond="ndlu",
                             linear_solver="gmres",
                             gmres_restart=60, linear_maxiter=240,
                             ndlu_leaf_max=192, prep32_tol=3e-6,
                             ew_eta_floor=1e-3 if deep else 0.0,
                             ew_endgame="standard" if deep else "tighten")
    if kind == "tpu_direct":
        return NewtonOptions(max_iter=max_iter, tol_residual=tol,
                             linear_solver="tpu_direct", ndlu_leaf_max=192,
                             ndlu_refine=1)
    return NewtonOptions(max_iter=max_iter, tol_residual=tol,
                         linear_tol=1e-4, gmres_restart=240,
                         linear_maxiter=480, precond="twolevel",
                         smooth_sweeps=1)


def bench_cavity():
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem

    n = int(os.environ.get("GOMA_BENCH_N", "64"))  # 64: 4096 Q2/Q1 elements
    prob = _cavity_problem(n)
    # mixed-precision Newton-Krylov: f64 residual (full 1e-10-capable
    # convergence), f32 Jacobian + Krylov (f64 is emulated on TPU)
    prob.jacobian_dtype = jnp.float32

    # single-variant headline (gmres + lagged selective-inversion NDLU — the
    # r3-measured winner); ladder falls back only on failure. The old 3-way
    # A/B burned two extra ~150 s compiles per run and timed out the driver.
    variants = {}
    kinds = tuple(os.environ.get("GOMA_BENCH_CAVITY_KINDS",
                                 "gmres+ndlu,twolevel").split(","))
    for kind in kinds:
        try:
            s, r, t, tw = _time_cavity_solver(prob, _cavity_opts(kind), kind)
        except Exception as e:
            log(f"bench[cavity:{kind}]: FAILED {type(e).__name__}: {e}")
            continue
        if r.converged:
            variants[kind] = (s, r, t, tw)
            break
    if not variants:
        return {"error": "no cavity solver converged"}, None
    best = min(variants, key=lambda k: variants[k][0])
    sec_per_iter, res, t_total, tw = variants[best]
    iters = max(res.iters, 1)
    log(f"bench[cavity]: headline = {best} at {sec_per_iter*1000:.0f} ms/iter")

    log("bench[cavity]: running 1-core reference baseline...")
    den = _ref_iter_denominator(prob, exact_ns=True)

    out = {
        "sec_per_iter": round(sec_per_iter, 6),
        "solver": best,
        "newton_iters": res.iters,
        "linear_iters": res.linear_iters,
        "asm_ms": round(res.assembly_time / iters * 1000, 1),
        "slv_ms": round(res.solve_time / iters * 1000, 1),
        "total_s": round(t_total, 3),
        "warmup_s": round(tw, 1),
        "converged": bool(res.converged),
        "vs_baseline": round(den["ref_iter_s"] / sec_per_iter, 2),
    }
    out.update(den)
    return out, (prob, best)


def bench_cavity_tol1e10(prob, kind):
    """Deep-convergence entry (the BASELINE 1e-10 parity bar) — recorded
    separately AFTER the five configs. r3 showed an 8x per-iteration cliff
    (linear_iters ballooning to 240 on a stale lagged factor); the
    staleness policy now refactors on linear-iteration growth."""
    try:
        s10, r10, t10, tw = _time_cavity_solver(
            prob, _cavity_opts(kind, tol=1e-10, max_iter=25),
            f"tol1e10:{kind}")
        return {
            "solver": kind,
            "converged": bool(r10.converged),
            "newton_iters": r10.iters,
            "linear_iters": r10.linear_iters,
            "sec_per_iter": round(s10, 6),
            "warmup_s": round(tw, 1),
            "res_norms_l2": [float(f"{r[1]:.4e}") for r in r10.res_norms],
            "res_norms_inf": [float(f"{r[2]:.4e}") for r in r10.res_norms],
        }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def bench_cavity_scaling(sizes=(128, 192)):
    """Size-scaling entries (VERDICT r3 items 2b/3): the TPU advantage must
    GROW with n — SuperLU's O(n^1.5) factor and the 1-core assembly both blow
    up where the batched element work and the multifrontal MXU fronts keep
    scaling. Each entry carries its own measured 1-core denominator.
    (256x256/592k dof OOMs the 16 GB chip under SELECTIVE INVERSION — that
    run is the multi-chip partitioned path's job.)"""
    import jax.numpy as jnp

    from __graft_entry__ import _cavity_problem
    from goma_tpu.solvers import NewtonOptions

    out = {}
    for n in sizes:
        if not gate(f"cavity_{n}", 120 + n):
            out[f"cavity_{n}"] = {"skipped": "budget"}
            continue
        try:
            prob = _cavity_problem(n)
            prob.jacobian_dtype = jnp.float32
            leaf = 192 if n <= 128 else 256
            opts = NewtonOptions(max_iter=20, tol_residual=1e-6,
                                 linear_tol=1e-4, precond="ndlu",
                                 linear_solver="gmres", gmres_restart=60,
                                 linear_maxiter=240, ndlu_leaf_max=leaf)
            sec, res, tt, tw = _time_cavity_solver(prob, opts, f"scale{n}")
            den = _ref_iter_denominator(prob, x=res.x, exact_ns=True)
            it = max(res.iters, 1)
            out[f"cavity_{n}"] = {
                "n_dof": prob.dofmap.n_dof,
                "sec_per_iter": round(sec, 6),
                "newton_iters": res.iters,
                "converged": bool(res.converged),
                "asm_ms": round(res.assembly_time / it * 1000, 1),
                "slv_ms": round(res.solve_time / it * 1000, 1),
                "warmup_s": round(tw, 1),
                "vs_baseline": round(den["ref_iter_s"] / sec, 2),
                **den,
            }
        except Exception as e:
            out[f"cavity_{n}"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        record(f"cavity_{n}", out[f"cavity_{n}"])
    return out


def _ref_iter_denominator(prob, x=None, nv2=None, nv1=None, exact_ns=False,
                          splu_reps=2, params=None):
    """1-core reference-style Newton-iteration time for THIS deck: compiled
    C++ -O3 scalar element assembly (exact NS kernel for the cavity, the
    generic multi-field kernel otherwise) + SuperLU direct solve on the
    deck's own assembled matrix (min of ``splu_reps`` repeats)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from goma_tpu.native import (ref_assembly_generic_seconds_per_element,
                                 ref_assembly_seconds_per_element)

    ne = prob.mesh.n_elem
    if exact_ns:
        t_elem = ref_assembly_seconds_per_element()
        if t_elem is None:
            t_elem = 14e-3 / 4096
    else:
        t_elem = ref_assembly_generic_seconds_per_element(nv2, nv1)
        if t_elem is None:
            t_elem = (9 * nv2 + 4 * nv1) ** 2 / 22.0**2 * 14e-3 / 4096
    if x is None:
        x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    p = dict(prob.base_params() if params is None else params)
    # transient decks: assemble the representative matrix in steady form
    p.setdefault("ct", jnp.asarray(0.0, dtype=prob.dtype))
    p.setdefault("hist", jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype))
    R, vals = prob._assemble(jnp.asarray(x, dtype=prob.dtype), p)
    A = sp.csr_matrix(
        (np.asarray(vals, dtype=np.float64), prob.pattern.indices,
         prob.pattern.indptr), shape=(prob.pattern.n,) * 2).tocsc()
    b = np.asarray(R, dtype=np.float64)
    ts = []
    for _ in range(splu_reps):
        t0 = time.perf_counter()
        lu = spla.splu(A)
        _ = lu.solve(b)
        ts.append(time.perf_counter() - t0)
        if ts[-1] > 30.0:
            break  # a 30+ s factor is already timing-stable
    t_direct = min(ts)
    t_iter = t_elem * ne + t_direct
    log(f"bench[ref]: 1-core iter ~ {t_iter*1000:.0f} ms "
        f"(asm {t_elem*ne*1000:.1f} + splu {t_direct*1000:.0f}, "
        f"min of {len(ts)})")
    return {"ref_iter_s": round(t_iter, 4),
            "ref_asm_s": round(t_elem * ne, 4),
            "ref_slv_s": round(t_direct, 4)}


def _steady_sec_per_iter(prob, opts, x0, params, ref_fields=None):
    """Warm (compile) + timed solve of a steady deck; s/Newton-iter."""
    import jax.numpy as jnp

    from goma_tpu.solvers import NewtonSolver

    solver = NewtonSolver(prob, opts)
    t0 = time.perf_counter()
    rw = solver.solve(x0, params)
    tw = time.perf_counter() - t0
    solver.reset_lagged()
    t0 = time.perf_counter()
    res = solver.solve(x0, params)
    tt = time.perf_counter() - t0
    it = max(res.iters, 1)
    out = {
        "sec_per_iter": round(tt / it, 6),
        "newton_iters": res.iters,
        "linear_iters": res.linear_iters,
        "converged": bool(res.converged),
        "total_s": round(tt, 3),
        "warmup_s": round(tw, 1),
    }
    if ref_fields is not None and res.converged:
        den = _ref_iter_denominator(prob, x=res.x, nv2=ref_fields[0],
                                    nv1=ref_fields[1], params=params)
        out.update(den)
        out["vs_baseline"] = round(den["ref_iter_s"] / out["sec_per_iter"], 2)
    return out


# --------------------------------------------------------------- config #2
def bench_buoyant(direct_kind="gmres_ndlu"):
    """Coupled momentum+energy+species (buoyant convection; mirrors
    examples/buoyant_convection.py)."""
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Energy, Momentum, Species
    from goma_tpu.physics.materials import BoussinesqBodyForce
    from goma_tpu.solvers import NewtonOptions

    # 48x48 (~47k dof with 5 fields/node): production-shaped
    n, Ra, Pr = 48, 1e4, 0.71
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, transient=False), Continuity(),
         Energy(interp="Q2", transient=False),
         Species(n_species=1, interp="Q2", transient=False)],
        {"rho": 1.0, "mu": Pr, "k": 1.0, "Cp": 1.0, "diffusivity": 1.0,
         "body_force": BoussinesqBodyForce([0.0, Ra * Pr], beta=-1.0, T0=0.5)})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("left", "temperature", 0, 1.0)
    prob.add_dirichlet("right", "temperature", 0, 0.0)
    prob.add_dirichlet("left", "species", 0, 1.0)
    prob.add_dirichlet("right", "species", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    prob.jacobian_dtype = jnp.float32
    if direct_kind == "gmres_ndlu":
        opts = NewtonOptions(max_iter=15, tol_residual=1e-6, linear_tol=1e-4,
                             precond="ndlu", linear_solver="gmres",
                             gmres_restart=60, linear_maxiter=240,
                             ndlu_leaf_max=256, ew_eta_floor=1e-3,
                             ew_endgame="standard")
    elif direct_kind == "tpu_direct":
        opts = NewtonOptions(max_iter=15, tol_residual=1e-6,
                             linear_solver="tpu_direct", ndlu_leaf_max=256)
    else:
        opts = NewtonOptions(max_iter=15, tol_residual=1e-6, linear_tol=1e-4,
                             precond="twolevel", smooth_sweeps=1,
                             gmres_restart=160, linear_maxiter=1000)
    out = _steady_sec_per_iter(prob, opts,
                               jnp.zeros(prob.dofmap.n_dof,
                                         dtype=prob.dtype),
                               prob.base_params(),
                               ref_fields=(4, 1))  # u,v,T,Y Q2; p Q1
    out["linear_solver"] = direct_kind
    return out


# --------------------------------------------------------------- config #4
def bench_viscoelastic(direct_kind="gmres_ndlu"):
    """EVSS-F/DEVSS Oldroyd-B channel. Strengthened per VERDICT r3 item 10:
    Wi = lam*U/H ~ 1.5 (was 0.45) and a ZERO initial guess (was the exact
    Newtonian profile) so the solve exercises >=5 production-shaped Newton
    iterations instead of 2."""
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (Continuity, Momentum,
                                  VelocityGradientProjection, VEStress)
    from goma_tpu.solvers import NewtonOptions

    # 64x32 (~34k dof with u,v Q2 + p,3S,4G Q1)
    n, lam, mu_p, mu_s, G, H = 32, 1.0, 1.0, 0.5, 2.0, 1.0
    mu_tot = mu_p + mu_s
    mesh = rectangle_mesh(2 * n, n, elem="QUAD9", xlim=(0, 2.0), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, transient=False, convection=False,
                  ve_stress_modes=1, devss_mu=mu_p),
         Continuity(),
         VEStress(0, dim=2, lam=lam, mu_p=mu_p, model="oldroyd_b",
                  interp="Q1", transient=False),
         VelocityGradientProjection(dim=2, interp="Q1")],
        {"rho": 0.0, "mu": mu_s, "body_force": np.array([G, 0.0])})
    uex = lambda c: G / (2 * mu_tot) * c[:, 1] * (H - c[:, 1])
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uex)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    prob.jacobian_dtype = jnp.float32
    x0 = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    if direct_kind == "gmres_ndlu":
        # loose-eta inexact Newton (see _cavity_opts deep note): the 1e-8
        # nonlinear target is reached through extra cheap Newton steps
        # instead of 180-iteration f32 Krylov grinds (r5: 3.5 -> ~1 s/iter)
        opts = NewtonOptions(max_iter=25, tol_residual=1e-8, linear_tol=1e-4,
                             precond="ndlu", linear_solver="gmres",
                             gmres_restart=60, linear_maxiter=240,
                             ndlu_leaf_max=192, ew_eta_floor=1e-3,
                             ew_endgame="standard")
    elif direct_kind == "tpu_direct":
        opts = NewtonOptions(max_iter=25, tol_residual=1e-8,
                             linear_solver="tpu_direct", ndlu_leaf_max=192)
    else:
        opts = NewtonOptions(max_iter=25, tol_residual=1e-8, linear_tol=1e-5,
                             precond="twolevel", smooth_sweeps=1,
                             gmres_restart=160, linear_maxiter=1500)
    out = _steady_sec_per_iter(prob, opts, x0, prob.base_params(),
                               ref_fields=(2, 8))  # u,v Q2; p+3S+4G Q1
    out["linear_solver"] = direct_kind
    return out


def _transient_sec_per_iter(make, warm_t, timed_t, ref_fields=None):
    """Warm a TransientSolver over [0, warm_t], then time the continuation
    over [warm_t, warm_t+timed_t]; s per Newton iteration of the timed leg."""
    log("transient: building problem...")
    ts, x0, params = make()
    log("transient: warm leg (first compiles)...")
    t0 = time.perf_counter()
    r1 = ts.run(x0, params)
    tw = time.perf_counter() - t0
    log(f"transient: warm leg done in {tw:.0f}s ({len(r1.steps)} steps); "
        "timed leg...")
    t0 = time.perf_counter()
    ts.topts.t_end = warm_t + timed_t
    r2 = ts.run(r1.x, params, t0=r1.t, xdot0=r1.xdot)
    tt = time.perf_counter() - t0
    log(f"transient: timed leg done in {tt:.0f}s")
    nit = sum(s.newton_iters for s in r2.steps if s.converged)
    out = {
        "sec_per_iter": round(tt / max(nit, 1), 6),
        "newton_iters": nit,
        "steps": len(r2.steps),
        "total_s": round(tt, 3),
        "warmup_s": round(tw, 1),
    }
    if ref_fields is not None and nit > 0:
        den = _ref_iter_denominator(ts.problem, x=r2.x, nv2=ref_fields[0],
                                    nv1=ref_fields[1], params=params)
        out.update(den)
        out["vs_baseline"] = round(den["ref_iter_s"] / out["sec_per_iter"], 2)
    return out


# --------------------------------------------------------------- config #3
def bench_slot_coater(direct_kind="gmres_ndlu"):
    """ALE free-surface slot coater (examples/slot_coater.py build())."""
    import importlib

    sys.path.insert(0, ".")
    sc = importlib.import_module("examples.slot_coater")

    def make():
        import jax.numpy as jnp

        # 96x24 (~40k dof): production-shaped slot coater
        if direct_kind == "gmres_ndlu":
            # f32 Jacobian/Krylov (f64 is software-emulated on TPU) with
            # loose per-step linear solves (Newton absorbs the inexactness;
            # the deck's 1e-9 linear_tol ground f32 Krylov at its floor)
            prob, ts, x0 = sc.build(
                nx=96, ny=24, t_end=0.04, linear_solver="gmres",
                jacobian_dtype=jnp.float32,
                newton_overrides=dict(precond="ndlu", gmres_restart=60,
                                      linear_maxiter=240,
                                      ndlu_leaf_max=256, linear_tol=1e-5,
                                      ew_eta_floor=1e-3,
                                      ew_endgame="standard",
                                      prep32_tol=3e-6))
        else:
            prob, ts, x0 = sc.build(nx=96, ny=24, t_end=0.04,
                                    linear_solver=direct_kind)
        return ts, x0, prob.base_params()

    out = _transient_sec_per_iter(make, 0.04, 0.08,
                                  ref_fields=(4, 1))  # u,v,dx,dy Q2; p Q1
    out["linear_solver"] = (direct_kind if direct_kind != "direct"
                            else "direct(host)")
    return out


# --------------------------------------------------------------- config #5
def bench_two_phase(direct_kind="gmres_ndlu"):
    """Level-set two-phase static bubble with CSF tension (mirrors
    examples/two_phase_bubble.py run_static)."""
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (Continuity, CSFSurfaceTension, FillEquation,
                                  Momentum)
    from goma_tpu.solvers import NewtonOptions
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    def make():
        # 48x48 (~31k dof)
        n, sigma, r0 = 48, 1.0, 0.5
        mesh = rectangle_mesh(n, n, elem="QUAD9", xlim=(-1, 1), ylim=(-1, 1))
        mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
        prob = Problem(
            mesh,
            [Momentum(dim=2, transient=True), Continuity(),
             CSFSurfaceTension(dim=2, sigma=sigma),
             FillEquation(interp="Q2", supg=0.0, transient=True)],
            {"rho": 1.0, "mu": 1.0})
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, "velocity", 0, 0.0)
            prob.add_dirichlet(ns, "velocity", 1, 0.0)
        prob.add_dirichlet("pin", "pressure", 0, 0.0)
        prob.finalize()
        prob.jacobian_dtype = jnp.float32
        F0 = np.linalg.norm(mesh.coords, axis=1) - r0
        x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0, F0)
        if direct_kind == "gmres_ndlu":
            nopts = NewtonOptions(max_iter=10, tol_residual=1e-8,
                                  linear_solver="gmres", precond="ndlu",
                                  linear_tol=1e-6, gmres_restart=60,
                                  linear_maxiter=240, ndlu_leaf_max=256)
        else:
            nopts = NewtonOptions(max_iter=10, tol_residual=1e-8,
                                  linear_solver=direct_kind)
        ts = TransientSolver(prob, nopts,
                             TimeOptions(dt0=0.02, t_end=0.04, adapt=False))
        return ts, x0, prob.base_params(ls_eps=jnp.asarray(0.2))

    out = _transient_sec_per_iter(make, 0.04, 0.04,
                                  ref_fields=(3, 1))  # u,v,F Q2; p Q1
    out["linear_solver"] = (direct_kind if direct_kind != "direct"
                            else "direct(host)")
    return out


def main():
    # the parent's canary child (below) owns TPU health-checking; the old
    # per-process 420 s probe paid an extra grant wait in EVERY child
    note = ""
    if os.environ.get("GOMA_BENCH_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        note = " [CPU FORCED]"
    import jax

    from goma_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache()
    n_cached = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    log(f"bench: compile cache at {cache_dir} ({n_cached} entries); "
        f"budget {BUDGET:.0f}s")
    jax.config.update("jax_enable_x64", True)

    SUMMARY["metric"] = (
        "assembly+solve sec per Newton iter (NS cavity 64x64 Q2Q1, 37507 "
        "dof, f64 residual/f32 Krylov; vs_baseline = speedup over 1-core "
        "reference-style iteration (C++ -O3 assembly + SuperLU direct)); "
        "'configs' = all five BASELINE decks + asm_element microbench + "
        "tol1e10 + size scaling" + note)

    if os.environ.get("GOMA_BENCH_CHILD"):
        # ------- child mode: run a comma-separated GROUP of configs ------
        # Emit one @@RESULT line per config as it completes, so a parent
        # timeout kill still harvests every finished config from the
        # captured stdout (BENCH_r04 lost the hung cavity record entirely).
        for name in os.environ["GOMA_BENCH_CHILD"].split(","):
            log(f"bench[{name}]: child config start")
            try:
                res = run_config(name)
            except Exception as e:  # keep the group going
                res = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"@@RESULT {name} " + json.dumps(res), flush=True)
        return

    # -------------- parent mode: one subprocess per config GROUP --------
    # A hung TPU call blocks Python signal handlers (the BENCH_r03 rc=124
    # failure mode: the process wedges inside the remote tunnel and even
    # SIGTERM handlers never run), so configs run in child processes with
    # hard wall timeouts. But every fresh process pays a TPU *grant* wait
    # (measured 45-115 s on this tunnel), so one-child-per-config burns
    # 400-1000 s of pure grant overhead — configs are therefore GROUPED,
    # and a wedged call loses only the rest of its own group.
    import subprocess

    def run_group(names, t_child):
        """Run a group child; returns {name: result} for every config that
        completed, plus a 'hung' marker for the one in flight on timeout."""
        env = dict(os.environ)
        env["GOMA_BENCH_CHILD"] = ",".join(names)
        env["GOMA_BENCH_BUDGET_S"] = str(int(t_child))
        out, err, rc, hung = "", "", None, False
        log(f"bench[{'+'.join(names)}]: child start (timeout {t_child:.0f}s)")
        try:
            cp = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=t_child, capture_output=True, text=True)
            out, err, rc = cp.stdout or "", cp.stderr or "", cp.returncode
        except subprocess.TimeoutExpired as te:
            hung = True
            out, err = te.stdout or "", te.stderr or ""
            if isinstance(out, bytes):
                out = out.decode("utf-8", "replace")
            if isinstance(err, bytes):
                err = err.decode("utf-8", "replace")
        results = {}
        for line in out.splitlines():
            if line.startswith("@@RESULT "):
                try:
                    name, payload = line[len("@@RESULT "):].split(" ", 1)
                    results[name] = json.loads(payload)
                except (ValueError, json.JSONDecodeError):
                    pass
        if hung:
            # the config in flight = first of the group without a result
            tail = " | ".join(err.strip().splitlines()[-2:])[-260:]
            for name in names:
                if name not in results:
                    results[name] = {
                        "hung": f"child killed after {t_child:.0f}s",
                        "last_progress": tail}
                    break
        elif rc not in (0, None) and not results:
            tail = err[-300:].replace("\n", " | ")
            results[names[0]] = {"error": f"child rc={rc}: {tail}"[:300]}
        return results, hung

    def canary(timeout_s=240.0):
        """Cheap TPU-health child: device init + one tiny matmul. Returns
        seconds-to-ready, or None if the TPU is unreachable. Distinguishes
        'TPU down — poll until it returns' from 'config slow' (the r4
        failure: both children hung at first TPU touch, 390 s blind sleeps
        burned the wall)."""
        t0 = time.perf_counter()
        try:
            cp = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "x = jnp.ones((128, 128)); print(float((x @ x)[0, 0]))"],
                env=dict(os.environ), timeout=timeout_s,
                capture_output=True, text=True)
            if cp.returncode == 0:
                return time.perf_counter() - t0
        except subprocess.TimeoutExpired:
            pass
        return None

    def canary_poll(budget_floor=420.0):
        """Poll the canary on a short cycle until the TPU answers or the
        remaining budget drops below ``budget_floor``. Returns "up" if the
        TPU answered, "down" if a canary attempt actually failed, "budget"
        if there was never room to try."""
        tried = False
        while remaining() > budget_floor:
            tried = True
            t = canary(timeout_s=min(240.0, remaining() - budget_floor))
            if t is not None:
                log(f"bench: TPU canary ok ({t:.0f}s to first matmul)")
                return "up"
            log(f"bench: TPU canary failed; retrying "
                f"({remaining():.0f}s left)")
            time.sleep(20)
        return "down" if tried else "budget"

    # groups ordered headline-first; ests assume the warm compile cache
    # (the committed .jax_cache) + one grant wait per child. THREE big
    # groups, not many small ones: each child pays a 5-140 s TPU grant
    # plus host table/symbolic rebuilds, and a killed group still
    # harvests every completed config from its @@RESULT lines — so the
    # tail group can be open-ended and simply record as far as it gets.
    plan = [
        (["cavity_ns", "asm_element"], 700),
        (["buoyant_mes", "viscoelastic"], 800),
        (["two_phase_ls", "slot_coater_ale", "cavity_tol1e10"], 1400),
    ]
    if os.environ.get("GOMA_BENCH_SCALING", "1") != "0":
        plan[-1] = (plan[-1][0] + ["cavity_128", "cavity_192"], 1400)

    def mark_rest(marker):
        """Record ``marker`` for every planned config still unrecorded."""
        for names, _ in plan:
            for n in names:
                if n not in SUMMARY["configs"]:
                    record(n, dict(marker))

    if canary_poll() != "up":
        log("bench: TPU unreachable and budget exhausted polling")
        mark_rest({"tpu_unreachable": True})
        SUMMARY["configs"]["_elapsed_s"] = round(elapsed(), 1)
        emit(final=True)
        return

    hangs = 0
    for gi, (names, est) in enumerate(plan):
        todo = [n for n in names if n not in SUMMARY["configs"]]
        if not todo:
            continue
        if not gate("+".join(todo), min(est, 250)):
            for n in todo:
                if n not in SUMMARY["configs"]:
                    record(n, {"skipped": "budget"})
            continue
        t_child = min(est, max(remaining() - 30, 60))
        results, hung = run_group(todo, t_child)
        # record everything harvested BEFORE any canary/poll wait — a
        # driver kill during the wait must not lose the hang record
        for n in todo:
            if n in results:
                record(n, results[n])
        if "cavity_ns" in results and "sec_per_iter" in results["cavity_ns"]:
            SUMMARY["value"] = results["cavity_ns"]["sec_per_iter"]
            SUMMARY["vs_baseline"] = results["cavity_ns"].get("vs_baseline")
            emit()
        if hung:
            hangs += 1
            if hangs >= 3:
                log("bench: third hang - marking remaining configs")
                mark_rest({"skipped": "after repeated hangs"})
                break
            # poll the canary instead of a blind 390 s sleep: a live TPU
            # resumes the plan immediately, a dead one is recorded as such
            state = canary_poll()
            if state != "up":
                log(f"bench: stopping after hang (canary: {state})")
                mark_rest({"tpu_unreachable": True} if state == "down"
                          else {"skipped": "budget"})
                break

    mark_rest({"skipped": "budget"})
    SUMMARY["configs"]["_elapsed_s"] = round(elapsed(), 1)
    emit(final=True)


def run_config(name):
    """Child-mode dispatcher: run ONE config, return its result dict."""
    if name == "asm_element":
        return bench_assembly_micro_sweep()
    if name == "cavity_ns":
        cav, _ = bench_cavity()
        return cav
    if name == "cavity_tol1e10":
        cav, state = bench_cavity()  # compile-cache-warm rebuild
        out = bench_cavity_tol1e10(*state)
        out["warm_cavity_sec_per_iter"] = cav.get("sec_per_iter")
        return out
    if name.startswith("cavity_") and name.split("_")[1].isdigit():
        n = int(name.split("_")[1])
        return bench_cavity_scaling(sizes=(n,)).get(name,
                                                    {"error": "gated"})
    ladder = {
        "buoyant_mes": (bench_buoyant,
                        ["gmres_ndlu", "tpu_direct", "twolevel"]),
        "viscoelastic": (bench_viscoelastic,
                         ["gmres_ndlu", "tpu_direct", "twolevel"]),
        "slot_coater_ale": (bench_slot_coater,
                            ["gmres_ndlu", "tpu_direct", "direct"]),
        "two_phase_ls": (bench_two_phase,
                         ["gmres_ndlu", "tpu_direct", "direct"]),
    }
    fn, kinds = ladder[name]
    res = {"error": "no solver rung ran"}
    for kind in kinds:
        try:
            res = fn(direct_kind=kind)
        except Exception as e:
            res = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"bench[{name}:{kind}]: FAILED {res['error']}")
            continue
        ok = res.get("converged", res.get("newton_iters", 1) > 0)
        if ok:
            break
        log(f"bench[{name}]: {kind} did not converge; trying next rung")
    return res


if __name__ == "__main__":
    main()
