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


class TwoPhasePorous(Equation):
    """Two-phase (liquid + gas) porous flow, components (p_liq, p_gas) of
    ``porous_pressure``. Reference: POROUS_TWO_PHASE media
    (``src/mm_fill_porous.c assemble_porous_transport:106`` gas-phase branch).

    Liquid:  phi dS/dt - div( k k_rl/mu_l (grad p_l - rho_l g) ) = 0
    Gas:     phi d[(1-S) rho_g]/dt
             - div( rho_g k k_rg/mu_g (grad p_g - rho_g g) ) = 0

    with S = S(p_c), p_c = p_g - p_l (van Genuchten), Mualem relative
    permeabilities k_rl(S), k_rg = sqrt(1-Se)(1 - Se^(1/m))^(2m). Gas is
    ideal-compressible when ``compressible`` (rho_g = rho_g_ref p_g/p_ref),
    else constant density.

    Material keys: permeability, porosity, mu_liquid, mu_gas, rho_liquid,
    rho_gas (reference density), p_ref, gravity_vec optional.
    """

    def __init__(self, model: VanGenuchten, interp: str = "Q1",
                 transient: bool = True, compressible: bool = False):
        super().__init__(POR_VAR, 2, interp)
        self.model = model
        self.transient = transient
        self.compressible = compressible

    def _sat_of_pc(self, pc):
        """S(p_c): suction = p_c > 0 dries the medium (same VG closure with
        p = -p_c)."""
        return self.model.saturation(-pc)

    def _krg(self, pc):
        m = self.model.m
        suction = jnp.where(pc > 0, pc, 0.0)
        se = (1.0 + (self.model.alpha * suction) ** self.model.n) ** (-m)
        se = jnp.clip(se, 1e-7, 1.0 - 1e-7)
        krg = jnp.sqrt(1.0 - se) * (1.0 - se ** (1.0 / m)) ** (2.0 * m)
        return jnp.maximum(krg, self.model.kr_min)

    def residual(self, fv, mat, params):
        import jax as _jax

        nq = fv.x.shape[0]
        pl = fv.val[POR_VAR][:, 0]
        pg = fv.val[POR_VAR][:, 1]
        gpl = fv.grad[POR_VAR][:, 0, :]
        gpg = fv.grad[POR_VAR][:, 1, :]
        pc = pg - pl

        k = prop(mat, "permeability", fv, params, 1.0)
        phi_por = prop(mat, "porosity", fv, params, 1.0)
        mul = prop(mat, "mu_liquid", fv, params, 1.0)
        mug = prop(mat, "mu_gas", fv, params, 1.0)
        rho_l = prop(mat, "rho_liquid", fv, params, 1.0)
        rho_g_ref = prop(mat, "rho_gas", fv, params, 1.0)
        p_ref = mat.get("p_ref", 1.0)
        rho_g = rho_g_ref * pg / p_ref if self.compressible else \
            rho_g_ref * jnp.ones_like(pg)

        krl = self.model.krel(-pc)
        krg = self._krg(pc)
        gvec = mat.get("gravity_vec", None)

        drive_l = gpl
        drive_g = gpg
        if gvec is not None:
            g = jnp.asarray(gvec)[None, :]
            drive_l = gpl - rho_l * g
            drive_g = gpg - rho_g[:, None] * g
        flux_l = (k * krl / mul)[:, None] * drive_l
        flux_g = (rho_g * k * krg / mug)[:, None] * drive_g

        phi_b = fv.phi[POR_VAR]
        gphi = fv.gphi[POR_VAR]
        rl = jnp.einsum("qk,qik->qi", flux_l, gphi)
        rg = jnp.einsum("qk,qik->qi", flux_g, gphi)
        if self.transient:
            dS = _jax.vmap(_jax.grad(self._sat_of_pc))(pc)
            pldot = fv.dot[POR_VAR][:, 0]
            pgdot = fv.dot[POR_VAR][:, 1]
            pcdot = pgdot - pldot
            S = self._sat_of_pc(pc)
            rl = rl + jnp.einsum("q,qi->qi", phi_por * dS * pcdot, phi_b)
            # gas storage: phi d[(1-S) rho_g]/dt
            gas_dot = -dS * pcdot * rho_g
            if self.compressible:
                gas_dot = gas_dot + (1.0 - S) * rho_g_ref / p_ref * pgdot
            rg = rg + jnp.einsum("q,qi->qi", phi_por * gas_dot, phi_b)
        return jnp.stack([rl, rg], axis=1)


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
        if "sink_linear" in mat and SINK_VAR in fv.val:
            # absorbing-particle sink (reference porous sink mass coupling,
            # J_pm_sink_mass blocks via AD): liquid removed at rate A
            S = self.model.saturation(p) if self.model is not None else 1.0
            A = sink_absorption_rate(fv, mat, params, S)
            contrib = contrib + jnp.einsum("q,qi->qi", A, phi_b)
        return contrib[:, None, :]


SINK_VAR = "sink_mass"


def sink_absorption_rate(fv, mat, params, saturation):
    """LINEAR porous-sink absorption rate (reference
    ``por_mass_source_model``, src/mm_fill_porous.c:11271):

        A = tau * k2 * (s_max - s) * S / s_max   (>= 0, gated on S >= S_on)

    Material key ``sink_linear`` = (tau, s_max, k2, S_on)."""
    tau, smax, k2, S_on = mat["sink_linear"]
    s = fv.val[SINK_VAR][:, 0]
    gate = jnp.where(saturation >= S_on, tau, 0.0)
    return gate * k2 * (smax - s) * saturation / smax


class PorousSinkMass(Equation):
    """Absorbed-mass evolution (reference ``assemble_pore_sink_mass``,
    src/mm_fill_porous.c:734): s_dot = rho_liquid * A with A the absorption
    rate; couple the matching ``-A`` liquid sink into ``PorousFlow`` via the
    ``sink_linear`` material key so total liquid + absorbed mass conserves."""

    def __init__(self, model: VanGenuchten | None = None, interp: str = "Q1"):
        super().__init__(SINK_VAR, 1, interp)
        self.model = model

    def residual(self, fv, mat, params):
        rho = prop(mat, "rho_liquid", fv, params, 1.0)
        if self.model is not None and POR_VAR in fv.val:
            S = self.model.saturation(fv.val[POR_VAR][:, 0])
        else:
            S = jnp.ones_like(fv.val[SINK_VAR][:, 0])
        A = sink_absorption_rate(fv, mat, params, S)
        r = fv.dot[SINK_VAR][:, 0] - rho * A
        return (r[:, None] * fv.phi[SINK_VAR])[:, None, :]
