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


class AcousticVelocityBC(FaceKernel):
    """APR_VELOCITY / API_VELOCITY (``src/mm_ns_bc.c:14425
    acoustic_plane_transmission``, velocity branch): prescribed boundary
    normal-velocity drive of the harmonic pressure pair — the reference
    adds -v to the real row and +v to the imaginary row, i.e. the imposed
    natural fluxes are dp_r/dn = +v, dp_i/dn = -v. ``v`` may be a constant
    or callable(sfv, mat, params) -> (nq,)."""

    def __init__(self, part: str, v):
        super().__init__(APR if part == "real" else API, 1)
        self.part = part
        self.v = v

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        v = self.v(sfv, mat, params) if callable(self.v) else \
            jnp.broadcast_to(jnp.asarray(self.v, dtype=sfv.x.dtype), (nq,))
        sgn = -1.0 if self.part == "real" else 1.0
        phi = sfv.phi[self.var]
        return sgn * (v[:, None] * phi)[:, None, :]


class LSAcousticRadiation(Equation):
    """LS_ACOUSTIC_SOURCE (``src/mm_fill_terms.c:12424
    assemble_ars_source``): acoustic-radiation (Reynolds-stress) pressure
    jump at the level-set interface as a delta-band momentum source,

        f = [ars_jump (p_r^2 + p_i^2)
             + grad_jump (|grad p_r|^2 + |grad p_i|^2)/(k R)^2] / (4 omega)

    pushing along the interface normal n_ls = grad F/|grad F|. Material
    keys: ``acoustic_k`` (wave number), ``acoustic_R`` (impedance) when
    grad_jump != 0."""

    def __init__(self, dim: int, omega: float, ars_jump: float,
                 grad_jump: float = 0.0, interp: str = "Q2"):
        super().__init__("velocity", dim, interp)
        self.dim = dim
        self.omega = omega
        self.ars_jump = ars_jump
        self.grad_jump = grad_jump

    def residual(self, fv, mat, params):
        from goma_tpu.physics.level_set import FILL_VAR, delta

        eps = params["ls_eps"]
        F = fv.val[FILL_VAR][:, 0]
        gF = fv.grad[FILL_VAR][:, 0, :]
        mag = jnp.sqrt(jnp.sum(gF * gF, axis=1) + 1e-30)
        n_ls = gF / mag[:, None]
        dl = delta(F, eps) * mag
        pr = fv.val[APR][:, 0]
        pi = fv.val[API][:, 0]
        force = self.ars_jump * (pr**2 + pi**2) / (4.0 * self.omega)
        if self.grad_jump:
            from goma_tpu.physics.materials import prop

            k = prop(mat, "acoustic_k", fv, params, 1.0)
            R = prop(mat, "acoustic_R", fv, params, 1.0)
            gpr = fv.grad[APR][:, 0, :]
            gpi = fv.grad[API][:, 0, :]
            g2 = jnp.sum(gpr * gpr + gpi * gpi, axis=1)
            force = force + self.grad_jump * g2 / (
                4.0 * self.omega * (k * R) ** 2)
        phi = fv.phi["velocity"]
        return -jnp.einsum("q,qa,qi->qai", force * dl, n_ls, phi)
