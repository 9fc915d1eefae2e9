"""Time-harmonic acoustic pressure (Helmholtz) equations.

Parity: reference acoustic variables APR/API (real/imaginary harmonic
pressure, ``include/rf_fem_const.h:861``) assembled in ``src/mm_fill.c``'s
acoustic branch. Complex Helmholtz  lap(p) + k^2 p = 0 split into coupled
real equations with an impedance/absorbing boundary via a face kernel:
dp/dn = -i k p  (first-order Sommerfeld).
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation, FaceKernel
from goma_tpu.physics.materials import prop

APR, API = "acoustic_preal", "acoustic_pimag"


class AcousticHelmholtz(Equation):
    """One of the two coupled real Helmholtz equations.

    part: "real" tests the real-part equation, "imag" the imaginary.
    Weak form (per part): int grad(phi).grad(p_part) - k^2 phi p_part.
    """

    def __init__(self, part: str, k: float, interp: str = "Q2"):
        super().__init__(APR if part == "real" else API, 1, interp)
        self.part = part
        self.k = k

    def residual(self, fv, mat, params):
        var = self.var
        p = fv.val[var][:, 0]
        gp = fv.grad[var][:, 0, :]
        phi = fv.phi[var]
        gphi = fv.gphi[var]
        c = jnp.einsum("qk,qik->qi", gp, gphi) - self.k**2 * jnp.einsum(
            "q,qi->qi", p, phi
        )
        return c[:, None, :]


class SommerfeldBC(FaceKernel):
    """First-order absorbing boundary: dp/dn = -i k p, i.e.
    real eq gets +k*p_imag, imag eq gets -k*p_real (weak flux).
    Reference: absorbing acoustic/EM BCs (src/mm_em_bc.c family)."""

    def __init__(self, part: str, k: float):
        super().__init__(APR if part == "real" else API, 1)
        self.part = part
        self.k = k

    def residual(self, sfv, mat, params):
        phi = sfv.phi[self.var]
        if self.part == "real":
            other = sfv.val[API][:, 0]
            flux = -self.k * other  # dpR/dn = +k pI -> -int phi dp/dn
        else:
            other = sfv.val[APR][:, 0]
            flux = self.k * other
        return jnp.einsum("q,qi->qi", flux, phi)[:, None, :]


class ProjectionEquation(Equation):
    """Generic L2 projection of a derived quantity onto a nodal field:
    int phi (q - source(fv)) — the reference's post-variable projections
    (shear rate, vorticity, etc., src/mm_post_proc.c global L2 projection)
    as first-class equations."""

    def __init__(self, var: str, ncomp: int, source, interp: str = "Q1"):
        super().__init__(var, ncomp, interp)
        self.source = source

    def residual(self, fv, mat, params):
        q = fv.val[self.var]  # (nq, ncomp)
        s = self.source(fv, mat, params)
        phi = fv.phi[self.var]
        return jnp.einsum("qc,qi->qci", q - s, phi)
