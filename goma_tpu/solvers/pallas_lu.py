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

# index-map constants must be explicit i32: under jax_enable_x64 plain
# python 0s canonicalize to i64 and Mosaic fails to legalize the index
# map's func.return (observed on v5e)
_I0 = lambda i: (i, jnp.int32(0), jnp.int32(0))
_I0b = lambda i: (i, jnp.int32(0))


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

    # i32 loop bounds: under jax_enable_x64 python-int bounds make the
    # index i64, and `ri == k` then promotes the i32 iota to i64 — a
    # conversion Mosaic cannot lower (infinite _convert_helper recursion)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), body, A)


def _trsv_kernel(lu_ref, b_ref, out_ref, *, m: int, lower: bool):
    """Single-RHS substitution against the packed LU: forward (unit-lower)
    or backward (upper, divides by the stored boosted pivots)."""
    L = lu_ref[0]
    b = b_ref[0]  # (1, m) — RHS carried as (nn, 1, m): Mosaic requires the
    # block's last two dims divisible by (8, 128) or equal to the array's
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(i, y):
        k = i if lower else jnp.int32(m - 1) - i
        rowk = jnp.sum(jnp.where(ri == k, L, 0.0), axis=0, keepdims=True)
        done = (ci < k) if lower else (ci > k)
        acc = jnp.sum(jnp.where(done, rowk * y, 0.0))
        bk = jnp.sum(jnp.where(ci == k, b, 0.0))
        yk = bk - acc
        if not lower:
            yk = yk / jnp.sum(jnp.where(ci == k, rowk, 0.0))
        return jnp.where(ci == k, yk, y)

    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), body,
                                   jnp.zeros_like(b))  # i32: see _lu_kernel


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def batched_trsv(lu, b, lower: bool = True, interpret: bool = False):
    """Batched single-RHS triangular substitution: (nn, m, m) packed LU x
    (nn, m) RHS -> (nn, m). One grid program per front, RHS in VMEM, the
    whole sweep in-kernel (XLA's triangular_solve pays per-step dispatch
    for single-column RHS on TPU, like lax.linalg.lu does)."""
    nn, m, _ = lu.shape
    kern = functools.partial(_trsv_kernel, m=m, lower=lower)
    out = pl.pallas_call(
        kern,
        grid=(nn,),
        in_specs=[pl.BlockSpec((1, m, m), _I0, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, m), _I0, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, m), _I0, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nn, 1, m), lu.dtype),
        interpret=interpret,
    )(lu, b.reshape(nn, 1, m))
    return out.reshape(nn, m)


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
        in_specs=[pl.BlockSpec((1, m, m), _I0, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m, m), _I0, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nn, m, m), A.dtype),
        interpret=interpret,
    )(A)
