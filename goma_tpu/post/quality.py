"""Element quality metrics + soft-failure detection.

Parity: reference ``src/el_quality.c:81 element_quality`` (jacobian/angle/
aspect metrics with a global stop trigger) and the negative-element-volume /
zero-detJ detection allreduced inside assembly (``src/mm_fill.c:267-283``)
that drives the transient dt-halving ladder.

``element_quality`` is one jitted reduction; ``TransientSolver`` can call it
every accepted step (quality_guard) and treat detJ <= 0 as a failed step.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.fem.fields import MESH_VAR


@dataclass
class QualityReport:
    min_detJ: float
    max_detJ: float
    jac_quality: float  # min over elements of (min detJ / max detJ) per elem
    ok: bool


def make_quality_fn(problem):
    """Returns jitted f(x) -> (min_detJ, max_detJ, jac_quality) over the
    (possibly ALE-displaced) mesh."""
    dtype = problem.dtype

    def f(x):
        x = jnp.asarray(x).astype(dtype)
        mins, maxs, quals = [], [], []
        for bd, blk, tables in zip(problem.dofmap.blocks, problem.mesh.blocks,
                                   problem.tables):
            Xref = jnp.asarray(problem.mesh.coords[blk.conn], dtype=dtype)
            dNg = jnp.asarray(tables.dNg, dtype=dtype)
            if bd.has(MESH_VAR):
                s = bd.slot(MESH_VAR)
                gather = jnp.asarray(bd.gather, dtype=jnp.int32)
                q = x[gather][:, s.start : s.start + s.size]
                d = q.reshape(q.shape[0], s.ncomp, s.nbf)
                Xc = Xref + jnp.swapaxes(d, 1, 2)
            else:
                Xc = Xref
            Jm = jnp.einsum("qnd,enk->eqkd", dNg, Xc)
            from goma_tpu.utils.la import det_and_inv

            det, _ = det_and_inv(Jm)
            mins.append(det.min())
            maxs.append(det.max())
            q_elem = det.min(axis=1) / jnp.maximum(det.max(axis=1), 1e-300)
            quals.append(q_elem.min())
        return (
            jnp.stack(mins).min(),
            jnp.stack(maxs).max(),
            jnp.stack(quals).min(),
        )

    return jax.jit(f)


def element_quality(problem, x, min_quality: float = 0.0) -> QualityReport:
    f = make_quality_fn(problem)
    mn, mx, q = (float(v) for v in jax.device_get(f(x)))
    return QualityReport(mn, mx, q, ok=(mn > 0.0 and q > min_quality))
