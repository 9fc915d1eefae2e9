"""Population-balance moment equations (QMOM).

Parity: reference ``src/mm_fill_population.c`` — transported moment
equations closed by quadrature (adaptive Wheeler inversion :44, growth /
nucleation sources). Moments M_k, k = 0..2N-1 of the particle size
distribution are advected with the flow; sources are evaluated at the
quadrature abscissas recovered from the moments.

    dM_k/dt + u.grad M_k = sum_j w_j [ k G(L_j) L_j^{k-1} ] + B0 L0^k  (+ ...)

The Wheeler algorithm builds the Jacobi matrix from moments; its
eigendecomposition gives abscissas/weights. For the small fixed N used here
(N <= 3) the symmetric tridiagonal eigenproblem is solved with explicit
formulas (N=1,2) — TPU-safe, no LAPACK.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.physics.fluid import advective_velocity

MOM_VAR = "moments"


def wheeler_n2(m):
    """Wheeler inversion for N=2 nodes from moments (m0..m3).
    Returns (weights (2,), abscissas (2,)). Batched over leading axes."""
    m0 = jnp.maximum(m[..., 0], 1e-300)
    s1 = m[..., 1] / m0
    s2 = m[..., 2] / m0
    s3 = m[..., 3] / m0
    # central moments
    c2 = jnp.maximum(s2 - s1**2, 1e-300)
    c3 = s3 - 3 * s1 * s2 + 2 * s1**3
    # Jacobi matrix [[a0, sqrt(b1)], [sqrt(b1), a1]]
    a0 = s1
    b1 = c2
    a1 = c3 / c2 + s1
    # eigenvalues of 2x2 symmetric
    tr = a0 + a1
    det = a0 * a1 - b1
    disc = jnp.sqrt(jnp.maximum(tr**2 / 4 - det, 0.0))
    L1 = tr / 2 - disc
    L2 = tr / 2 + disc
    # weights from first eigenvector components: w_i = m0 * v0i^2
    # eigenvector for L: (sqrt(b1), L - a0) normalized
    sb = jnp.sqrt(b1)

    def w_of(L):
        v0, v1 = sb, L - a0
        n2 = v0**2 + v1**2
        return m0 * v0**2 / jnp.maximum(n2, 1e-300)

    return jnp.stack([w_of(L1), w_of(L2)], -1), jnp.stack([L1, L2], -1)


class MomentEquations(Equation):
    """Four transported moments (N=2 QMOM) with growth G(L) and nucleation.

    growth: callable G(L) -> growth rate (jax scalar fn); nucleation_rate B0
    at size L0.
    """

    def __init__(self, growth=None, nucleation_rate: float = 0.0, L0: float = 0.0,
                 interp: str = "Q1", transient: bool = True, supg: float = 0.5):
        super().__init__(MOM_VAR, 4, interp)
        self.growth = growth
        self.B0 = nucleation_rate
        self.L0 = L0
        self.transient = transient
        self.supg = supg

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        M = fv.val[MOM_VAR]  # (nq, 4)
        gM = fv.grad[MOM_VAR]  # (nq, 4, dim)
        if "velocity" in fv.val:
            u = advective_velocity(fv)
            adv = jnp.einsum("qk,qck->qc", u, gM)
        else:
            u = jnp.zeros((nq, fv.dim))
            adv = jnp.zeros_like(M)
        r = adv
        if self.transient:
            r = r + fv.dot[MOM_VAR]

        # quadrature closure source
        if self.growth is not None or self.B0 != 0.0:
            w, L = wheeler_n2(M)  # (nq, 2)
            src = jnp.zeros_like(M)
            ks = jnp.arange(4.0)
            if self.growth is not None:
                G = self.growth(L)  # (nq, 2)
                Lsafe = jnp.maximum(L, 1e-300)
                # k G(L_j) L_j^{k-1}
                term = jnp.einsum(
                    "k,qj,qkj->qk",
                    ks,
                    w * G,
                    Lsafe[:, None, :] ** jnp.maximum(ks - 1.0, 0.0)[None, :, None],
                )
                src = src + term
            if self.B0 != 0.0:
                src = src + self.B0 * self.L0 ** ks[None, :]
            r = r - src

        phi = fv.phi[MOM_VAR]
        if self.supg > 0 and "velocity" in fv.val:
            gphi = fv.gphi[MOM_VAR]
            u2 = jnp.sum(u * u, axis=1)
            tau = self.supg * fv.h_elem * jnp.sqrt(u2 + 1e-30) / (2.0 * u2 + 1e-12)
            w_t = phi + tau[:, None] * jnp.einsum("qk,qik->qi", u, gphi)
        else:
            w_t = phi
        return jnp.einsum("qc,qi->qci", r, w_t)


def lognormal_moments(m, i: int = 1, j: int = 3, n_moments: int = 4):
    """Moments of the log-normal distribution fitted through (m0, m_i, m_j).

    Reference: ``moments_set_lognormal`` (src/mm_fill_population.c:55):
    mu and sigma^2 from two moment ratios, then
    M_k = m0 exp(k mu + k^2 sigma^2 / 2). Batched over leading axes."""
    m0 = jnp.maximum(m[..., 0], 1e-300)
    ri = jnp.log(jnp.maximum(m[..., i], 1e-300) / m0)
    rj = jnp.log(jnp.maximum(m[..., j], 1e-300) / m0)
    mu = (j / (i * j - i * i)) * ri + (i / (i * j - j * j)) * rj
    sig2 = ((2.0 / (j * j)) * rj - (2.0 / (i * j)) * ri) / (1.0 - i / j)
    sig2 = jnp.maximum(sig2, 0.0)
    ks = jnp.arange(float(n_moments))
    return m0[..., None] * jnp.exp(ks * mu[..., None]
                                   + 0.5 * ks**2 * sig2[..., None])


def moment_correction_wright(m, n_moments: int = 4):
    """Wright log-normal moment correction (reference
    ``moment_correction_wright:78``, after Marchisio & Fox 2013): replace an
    unrealizable moment set by the average of the log-normal reconstructions
    through (m0, m1, m3) and (m0, m2, m3)."""
    m1 = lognormal_moments(m, 1, 3, n_moments)
    m2 = lognormal_moments(m, 2, 3, n_moments)
    return 0.5 * (m1 + m2)
