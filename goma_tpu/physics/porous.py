"""Porous-media flow: saturated Darcy and unsaturated Richards equation.

Parity: reference ``src/mm_fill_porous.c`` (``assemble_porous_transport:106``,
property loading ``load_porous_properties:995``) — the saturated /
unsaturated liquid-phase transport subset, with van Genuchten / Mualem
closures re-derived from the standard formulas (the reference implements the
same models as hand-coded C with hand-coded derivatives).

Richards equation (pressure head form, liquid phase):
    phi * dS(p)/dt  -  div( k k_r(p)/mu * (grad p - rho g) ) = 0
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.physics.materials import prop

POR_VAR = "porous_pressure"


class VanGenuchten:
    """S_eff(p) = [1 + (alpha |p|)^n]^(-m), m = 1-1/n for p < 0 (suction);
    Mualem relative permeability k_r = sqrt(S)[1-(1-S^(1/m))^m]^2."""

    def __init__(self, alpha: float, n: float, s_res: float = 0.0, s_sat: float = 1.0,
                 kr_min: float = 1e-6):
        # kr_min regularizes the dry limit (k_r, dS/dp -> 0 makes the system
        # singular; same role as the reference's porous cutoffs)
        self.alpha, self.n, self.m = alpha, n, 1.0 - 1.0 / n
        self.s_res, self.s_sat = s_res, s_sat
        self.kr_min = kr_min

    def saturation(self, p):
        # smooth through p=0: suction = softplus(-p) keeps AD well-behaved
        suction = jnp.where(p < 0, -p, 0.0)
        se = (1.0 + (self.alpha * suction) ** self.n) ** (-self.m)
        return self.s_res + (self.s_sat - self.s_res) * se

    def krel(self, p):
        suction = jnp.where(p < 0, -p, 0.0)
        se = (1.0 + (self.alpha * suction) ** self.n) ** (-self.m)
        se = jnp.clip(se, 1e-7, 1.0)
        kr = jnp.sqrt(se) * (1.0 - (1.0 - se ** (1.0 / self.m)) ** self.m) ** 2
        return jnp.maximum(kr, self.kr_min)


class PorousFlow(Equation):
    """Saturated (model=None) or unsaturated (model=VanGenuchten) flow.

    Material keys: ``permeability`` k, ``porosity`` phi, ``mu_liquid``,
    ``gravity_vec`` optional (dim,).
    """

    def __init__(self, model: VanGenuchten | None = None, interp: str = "Q1",
                 transient: bool = True):
        super().__init__(POR_VAR, 1, interp)
        self.model = model
        self.transient = transient

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        p = fv.val[POR_VAR][:, 0]
        gp = fv.grad[POR_VAR][:, 0, :]
        k = prop(mat, "permeability", fv, params, 1.0)
        mu = prop(mat, "mu_liquid", fv, params, 1.0)
        phi_por = prop(mat, "porosity", fv, params, 1.0)

        kr = self.model.krel(p) if self.model is not None else 1.0
        mob = k * kr / mu
        drive = gp
        gvec = mat.get("gravity_vec", None)
        if gvec is not None:
            rho = prop(mat, "rho_liquid", fv, params, 1.0)
            drive = gp - rho * jnp.asarray(gvec)[None, :]
        flux = (mob if jnp.ndim(mob) == 0 else mob[:, None]) * drive

        phi_b = fv.phi[POR_VAR]
        gphi = fv.gphi[POR_VAR]
        contrib = jnp.einsum("qk,qik->qi", flux, gphi)
        if self.transient and self.model is not None:
            # phi * dS/dt = phi * S'(p) * pdot  (AD supplies S'(p))
            import jax as _jax

            dS = _jax.vmap(_jax.grad(lambda pp: self.model.saturation(pp)))(p)
            pdot = fv.dot[POR_VAR][:, 0]
            contrib = contrib + jnp.einsum("q,qi->qi", phi_por * dS * pdot, phi_b)
        return contrib[:, None, :]
