"""Bifurcation (singular-point) tracking: turning points (folds).

Parity: reference LOCA turning-point tracking (``src/loca_bord.c``
turning-point bordering algorithms, driven through ``src/ac_loca_interface.c
do_loca``). The reference hand-codes the second-derivative (J v)_x action by
finite differences of the Jacobian; here both G_lam and the Hessian actions
are exact nested ``jax.jvp`` through the assembled residual.

Moore-Spence extended system for a fold at (x*, lam*):

    G(x, lam)      = 0      (equilibrium)
    J(x, lam) v    = 0      (singular Jacobian, null vector v)
    c . v - 1      = 0      (normalization)

solved by Newton with block elimination — four J-solves per iteration
(a = J^-1 G, b = J^-1 G_lam, and two for the null-vector row), the same
bordering structure the reference uses, so the only large solves are with
the standard Jacobian and any of the framework's linear solvers applies.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.solvers.newton import NewtonOptions, NewtonSolver


@dataclass
class FoldResult:
    x: np.ndarray
    lam: float
    null_vector: np.ndarray
    iters: int
    converged: bool
    res_norms: list


def _make_ops(problem, make_params):
    """Jittable residual/derivative actions for the extended system."""

    def res(x, lam):
        return problem._residual_only(x, make_params(lam))

    def Jv(x, lam, v):
        return jax.jvp(lambda xx: res(xx, lam), (x,), (v,))[1]

    def G_lam(x, lam):
        return jax.jvp(lambda l: res(x, l), (lam,), (jnp.ones_like(lam),))[1]

    def Hx_v(x, lam, v, dx):
        # (J v)_x dx: second derivative of G, exact nested jvp
        return jax.jvp(lambda xx: Jv(xx, lam, v), (x,), (dx,))[1]

    def Hlam_v(x, lam, v):
        return jax.jvp(lambda l: Jv(x, l, v), (lam,), (jnp.ones_like(lam),))[1]

    return (jax.jit(res), jax.jit(Jv), jax.jit(G_lam), jax.jit(Hx_v),
            jax.jit(Hlam_v))


def fold_track(
    problem,
    make_params: Callable[[float], dict],
    lam0: float,
    x0,
    newton_options: NewtonOptions | None = None,
    max_iter: int = 20,
    tol: float = 1e-8,
    v0=None,
) -> FoldResult:
    """Converge onto the turning point nearest (x0, lam0).

    ``make_params(lam)`` must be jax-traceable in lam (the usual pytree
    builder). Start from a converged (or near-converged) point on the branch
    close to the fold — e.g. the last step before ``detect_folds`` fires in
    an arclength run.
    """
    opts = newton_options or NewtonOptions(linear_solver="direct")
    solver = NewtonSolver(problem, opts)
    dtype = problem.dtype

    def linsolve(vals, rhs):
        if opts.linear_solver == "direct":
            from goma_tpu.solvers.linear import direct_solve_host

            return np.asarray(
                direct_solve_host(problem.pattern, np.asarray(vals), np.asarray(rhs))
            )
        lr = solver._solve_gmres(vals, jnp.asarray(rhs))
        return np.asarray(lr.x)

    res_f, Jv_f, Glam_f, Hxv_f, Hlamv_f = _make_ops(problem, make_params)

    x = jnp.asarray(np.asarray(x0, dtype=float), dtype=dtype)
    lam = jnp.asarray(lam0, dtype=dtype)
    n = x.shape[0]

    # null-vector seed: inverse iteration with the (near-singular) Jacobian
    _, vals = problem.assemble(x, make_params(lam))
    if v0 is None:
        rng = np.random.RandomState(0)
        v = linsolve(vals, rng.standard_normal(n))
    else:
        v = np.asarray(v0, dtype=float)
    v = v / np.linalg.norm(v)
    c = v.copy()  # fixed normalization vector

    norms = []
    converged = False
    it = 0
    best = (np.inf, None)
    for it in range(max_iter):
        params = make_params(lam)
        Rg = np.asarray(res_f(x, lam), dtype=float)
        S = np.asarray(Jv_f(x, lam, jnp.asarray(v, dtype=dtype)), dtype=float)
        N = float(np.dot(c, v) - 1.0)
        rnorm = max(np.abs(Rg).max(), np.abs(S).max(), abs(N))
        norms.append(rnorm)
        if rnorm < best[0]:
            best = (rnorm, (np.asarray(x).copy(), float(lam), v.copy()))
        if rnorm < tol:
            converged = True
            break
        # AT the fold J is exactly singular: once the iterates are converged
        # to solver precision the bordered solves turn to noise — stop at the
        # best iterate instead of wandering
        if best[0] < np.inf and rnorm > 100.0 * best[0]:
            break

        _, vals = problem.assemble(x, params)
        gl = np.asarray(Glam_f(x, lam), dtype=float)
        a = linsolve(vals, Rg)       # J a = G
        b = linsolve(vals, gl)       # J b = G_lam
        vj = jnp.asarray(v, dtype=dtype)
        Hxa = np.asarray(Hxv_f(x, lam, vj, jnp.asarray(a, dtype=dtype)), dtype=float)
        Hxb = np.asarray(Hxv_f(x, lam, vj, jnp.asarray(b, dtype=dtype)), dtype=float)
        Hl = np.asarray(Hlamv_f(x, lam, vj), dtype=float)
        # dv = p + dlam q with J p = -S + Hx a, J q = Hx b - Hlam
        p = linsolve(vals, -S + Hxa)
        q = linsolve(vals, Hxb - Hl)
        cq = np.dot(c, q)
        if abs(cq) < 1e-300:
            break
        dlam = -(N + np.dot(c, p)) / cq
        dx = -a - dlam * b
        dv = p + dlam * q
        x = x + jnp.asarray(dx, dtype=dtype)
        v = v + dv
        lam = lam + jnp.asarray(dlam, dtype=dtype)
        if not (np.all(np.isfinite(np.asarray(x))) and np.isfinite(float(lam))):
            break

    if best[1] is not None:
        xb, lb, vb = best[1]
        return FoldResult(x=xb, lam=lb, null_vector=vb, iters=it,
                          converged=best[0] < tol, res_norms=norms)
    return FoldResult(
        x=np.asarray(x), lam=float(lam), null_vector=v,
        iters=it, converged=converged, res_norms=norms,
    )
