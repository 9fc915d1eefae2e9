"""Batched dense unpivoted LU as one Pallas TPU kernel.

``jax.lax.linalg.lu`` on TPU executes one sequential step per pivot with
per-step dispatch overhead (~1 ms/step measured on v5e across NDLU's
frontal batches: 1939 steps -> ~2 s factor for the 64x64 cavity).  The
multifrontal factor only needs an UNPIVOTED LU — front rows are
pre-ordered elliptic-first / saddle-last by ``NDLU(defer_dofs=...)`` and
protected by a GESP pivot boost + iterative refinement (SuperLU_DIST
GESP-style; reference analog: the full-pivoting host solvers it replaces,
``src/sl_umf.c``) — so the entire elimination runs INSIDE one kernel with
the front resident in VMEM: ``m`` fori_loop steps of masked rank-1
updates, zero HBM traffic and zero dispatch between steps.

Each grid program factors one front: block (1, m, m) in VMEM (m <= ~1000
fits comfortably in 16 MB). Row/column extraction uses masked reductions
(dynamic lane indexing is slow on TPU); the rank-1 trailing update is
masked so rows/columns <= k are left holding their final L/U values.

``interpret=True`` runs the same kernel as traced JAX ops — the CPU path
used by tests (and the CPU fallback in NDLU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lu_kernel(a_ref, out_ref, *, m: int, pivot_tol: float):
    A = a_ref[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    # GESP boost scale: relative to the front's largest initial diagonal
    dmax = jnp.max(jnp.where(ri == ci, jnp.abs(A), 0.0))
    tau = jnp.asarray(pivot_tol, A.dtype) * jnp.maximum(
        dmax, jnp.asarray(1e-30, A.dtype))

    def body(k, A):
        rowk = jnp.sum(jnp.where(ri == k, A, 0.0), axis=0, keepdims=True)
        colk = jnp.sum(jnp.where(ci == k, A, 0.0), axis=1, keepdims=True)
        piv = jnp.sum(jnp.where(ci == k, rowk, 0.0))
        piv = jnp.where(jnp.abs(piv) < tau,
                        jnp.where(piv < 0, -tau, tau), piv)
        l = jnp.where(ri > k, colk / piv, jnp.zeros_like(colk))  # (m, 1)
        u = jnp.where(ci > k, rowk, jnp.zeros_like(rowk))        # (1, m)
        A = A - l * u  # touches only the strict trailing submatrix
        A = jnp.where((ci == k) & (ri > k), l, A)   # store L in column k
        A = jnp.where((ci == k) & (ri == k), piv, A)  # boosted pivot
        return A

    out_ref[0] = jax.lax.fori_loop(0, m, body, A)


def _trsv_kernel(lu_ref, b_ref, out_ref, *, m: int, lower: bool):
    """Single-RHS substitution against the packed LU: forward (unit-lower)
    or backward (upper, divides by the stored boosted pivots)."""
    L = lu_ref[0]
    b = b_ref[:]  # (1, m)
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(i, y):
        k = i if lower else m - 1 - i
        rowk = jnp.sum(jnp.where(ri == k, L, 0.0), axis=0, keepdims=True)
        done = (ci < k) if lower else (ci > k)
        acc = jnp.sum(jnp.where(done, rowk * y, 0.0))
        bk = jnp.sum(jnp.where(ci == k, b, 0.0))
        yk = bk - acc
        if not lower:
            yk = yk / jnp.sum(jnp.where(ci == k, rowk, 0.0))
        return jnp.where(ci == k, yk, y)

    out_ref[:] = jax.lax.fori_loop(0, m, body, jnp.zeros_like(b))


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def batched_trsv(lu, b, lower: bool = True, interpret: bool = False):
    """Batched single-RHS triangular substitution: (nn, m, m) packed LU x
    (nn, m) RHS -> (nn, m). One grid program per front, RHS in VMEM, the
    whole sweep in-kernel (XLA's triangular_solve pays per-step dispatch
    for single-column RHS on TPU, like lax.linalg.lu does)."""
    nn, m, _ = lu.shape
    kern = functools.partial(_trsv_kernel, m=m, lower=lower)
    return pl.pallas_call(
        kern,
        grid=(nn,),
        in_specs=[pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nn, m), lu.dtype),
        interpret=interpret,
    )(lu, b)


@functools.partial(jax.jit, static_argnames=("pivot_tol", "interpret"))
def batched_lu(A, pivot_tol: float = 1e-8, interpret: bool = False):
    """Unpivoted packed LU of a batch of square fronts.

    A: (nn, m, m). Returns (nn, m, m) with unit-lower L below the diagonal
    and U on/above it, diagonal boosted to ``pivot_tol * max|diag0|``.
    """
    nn, m, _ = A.shape
    kern = functools.partial(_lu_kernel, m=m, pivot_tol=pivot_tol)
    return pl.pallas_call(
        kern,
        grid=(nn,),
        in_specs=[pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nn, m, m), A.dtype),
        interpret=interpret,
    )(A)
