"""Small dense linear algebra with explicit formulas.

The isoparametric map Jacobian is (dim, dim) with dim in {1,2,3}; explicit
cofactor inverses keep the TPU hot path on the VPU (no LU lowering) and are
AD-friendly. Reference analog: ``beer_belly`` hand-codes the same inverses
(``src/mm_fill_util.c:139``).
"""

from __future__ import annotations

import jax.numpy as jnp


def det_and_inv(J):
    """Batched determinant + inverse for (..., d, d), d in {1, 2, 3}."""
    d = J.shape[-1]
    if d == 1:
        det = J[..., 0, 0]
        inv = (1.0 / det)[..., None, None]
        return det, inv
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        det = a * e - b * c
        idet = 1.0 / det
        inv = jnp.stack(
            [
                jnp.stack([e * idet, -b * idet], axis=-1),
                jnp.stack([-c * idet, a * idet], axis=-1),
            ],
            axis=-2,
        )
        return det, inv
    if d == 3:
        a00, a01, a02 = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
        a10, a11, a12 = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
        a20, a21, a22 = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        idet = 1.0 / det
        c10 = a02 * a21 - a01 * a22
        c11 = a00 * a22 - a02 * a20
        c12 = a01 * a20 - a00 * a21
        c20 = a01 * a12 - a02 * a11
        c21 = a02 * a10 - a00 * a12
        c22 = a00 * a11 - a01 * a10
        inv = jnp.stack(
            [
                jnp.stack([c00 * idet, c10 * idet, c20 * idet], axis=-1),
                jnp.stack([c01 * idet, c11 * idet, c21 * idet], axis=-1),
                jnp.stack([c02 * idet, c12 * idet, c22 * idet], axis=-1),
            ],
            axis=-2,
        )
        return det, inv
    raise ValueError(d)
