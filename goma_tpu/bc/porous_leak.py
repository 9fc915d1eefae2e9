"""Porous-surface and leak boundary conditions.

Parity: the reference's porous/leak BC family —

- POROUS_FLUX (``src/bc_integ.c:1417`` -> ``src/mm_fill_porous.c:3855
  porous_mass_flux_surf_bc``): convective evaporative mass transfer out of
  a partially-saturated porous medium, driven by the equilibrium gas-phase
  solvent density at the surface (Kelvin equation,
  ``src/mm_fill_porous.c:7038 load_gas_conc``), plus an optional
  forced-liquid extraction term above a sink pressure.
- POROUS_LIQ_FLUX_CONST / POROUS_GAS_FLUX_CONST (``src/bc_integ.c:1450``):
  constant fluxes — covered by :class:`~goma_tpu.bc.NormalFlux` on the
  ``porous_pressure`` components.
- LATENT_HEAT (``src/bc_integ.c:1603 lat_heat_bc`` ->
  ``src/mm_fill_species.c:7615``): evaporative latent-heat sink on the
  energy equation, q_n = sum_w L_w * mdot_w.
- VNORM_LEAK (``include/rf_bc_const.h:864``; ``src/mm_ns_bc.c``
  kin_bc_leak family): normal-velocity closure n.(v - vs) = sum_w
  mdot_w / rho through a permeable / evaporating wall, applied as a weak
  penalty on the momentum rows (the velocity-equation sibling of KIN_LEAK,
  which our :class:`~goma_tpu.bc.KinematicBC(leak=...)` applies to the
  mesh rows).

All Jacobian couplings (porous pressure, temperature, mesh position) come
from AD of these residuals — the reference hand-codes each block
(``d_func[...]`` loops in porous_mass_flux_surf_bc).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.physics.materials import prop
from goma_tpu.physics.porous import POR_VAR


def kelvin_gas_density(p_liq, mat, params, T=None):
    """Equilibrium gas-phase solvent density over the porous meniscus
    (Kelvin equation; ``src/mm_fill_porous.c:7038 load_gas_conc``):

        rho_gv = (Mw / (R T)) * Psat * exp(-p_c * Mw / (rho_l R T)),
        p_c = -p_liq  (suction positive)

    Material keys (mirroring ``mp->u_porous_vapor_pressure[i_pl][0..4]``):
    ``vapor_Psat`` flat-interface vapor pressure, ``rho_liquid``,
    ``vapor_Mw`` solvent molecular weight, ``gas_R`` gas constant,
    ``vapor_T`` temperature (used when no energy equation supplies T).
    """
    Mw = mat["vapor_Mw"]
    R = mat["gas_R"]
    rho_l = mat.get("rho_liquid", 1.0)
    if T is None:
        T = mat["vapor_T"]
    Psat = mat["vapor_Psat"]
    rho_sat = Mw / (R * T) * Psat
    pc = jnp.maximum(-p_liq, 0.0)
    return rho_sat * jnp.exp(-pc * Mw / (rho_l * R * T))


class PorousMassFlux(FaceKernel):
    """POROUS_FLUX (``src/mm_fill_porous.c:3855 porous_mass_flux_surf_bc``):
    weak flux on the porous liquid-pressure equation

        q_n = porosity * k_m * (rho_gv(p_liq[, T]) - Y_c)
            + porosity * k_m1 * (p_liq - p_0)   [only where p_liq >= p_0]

    with rho_gv the Kelvin-equation gas density (:func:`kelvin_gas_density`)
    — evaporation into a bath of solvent density ``Y_c`` — and the second
    term forced-liquid extraction above the sink pressure ``p_0``. When the
    problem carries a ``temperature`` field it feeds the Kelvin factor
    (reference R_POR_ENERGY branch).
    """

    def __init__(self, k_m: float, Y_c: float = 0.0, k_m1: float = 0.0,
                 p_0: float = 0.0, comp: int = 0, ncomp: int = 1):
        super().__init__(POR_VAR, ncomp)
        self.k_m, self.Y_c = k_m, Y_c
        self.k_m1, self.p_0 = k_m1, p_0
        self.comp = comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        p = sfv.val[POR_VAR][:, self.comp]
        phi_por = prop(mat, "porosity", sfv, params, 1.0)
        T = sfv.val["temperature"][:, 0] if "temperature" in sfv.val else None
        rho_gv = kelvin_gas_density(p, mat, params, T=T)
        q = phi_por * self.k_m * (rho_gv - self.Y_c)
        if self.k_m1:
            q = q + phi_por * self.k_m1 * jnp.where(
                p >= self.p_0, p - self.p_0, 0.0)
        phi = sfv.phi[POR_VAR]
        # outward (evaporative) flux enters the weak form with + sign,
        # same convention as ConvectiveHeatFlux (QCONV)
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(q[:, None] * phi)


class LatentHeatFlux(FaceKernel):
    """LATENT_HEAT (``src/bc_integ.c:1603 lat_heat_bc``,
    ``src/mm_fill_species.c:7615``): evaporative latent-heat sink on the
    energy equation,

        q_n = sum_w L_w * mdot_w

    ``fluxes``: list of (L_w, mdot_w) pairs; each mdot_w is a scalar or a
    callable(sfv, mat, params) -> (nq,) mass flux — e.g. the same
    mass-transfer closure driving a YFLUX/POROUS_FLUX condition on the
    species/porous equation, so the energy and mass leaks stay consistent
    (the reference ties them via the BC_Data_Int[1] cross reference)."""

    def __init__(self, fluxes):
        super().__init__("temperature", 1)
        self.fluxes = list(fluxes)

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        q = jnp.zeros((nq,), dtype=sfv.x.dtype)
        for L, mdot in self.fluxes:
            m = mdot(sfv, mat, params) if callable(mdot) else mdot
            q = q + L * jnp.broadcast_to(jnp.asarray(m), (nq,))
        phi = sfv.phi["temperature"]
        # outward energy flux (evaporative cooling): + sign like QCONV
        return (q[:, None] * phi)[:, None, :]


class VNormLeak(FaceKernel):
    """VNORM_LEAK (``include/rf_bc_const.h:864``; kin_bc_leak family
    ``src/mm_fill_species.c``): normal-velocity closure through an
    evaporating / permeable wall,

        penalty * (n.(u - xdot) - sum_w mdot_w / rho) n_a phi_i

    on the momentum rows. ``leak``: scalar or callable(sfv, mat, params)
    -> (nq,) net normal leak VELOCITY (mass flux / rho)."""

    def __init__(self, dim: int, leak=0.0, penalty: float = 1e6):
        super().__init__("velocity", dim)
        self.dim = dim
        self.leak = leak
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        from goma_tpu.fem.fields import MESH_VAR

        n = sfv.normal
        u = sfv.val["velocity"]
        if MESH_VAR in sfv.dot:
            u = u - sfv.dot[MESH_VAR]
        un = jnp.einsum("qk,qk->q", n, u)
        lk = self.leak(sfv, mat, params) if callable(self.leak) else self.leak
        mis = un - lk
        phi = sfv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, n, phi)


class PorousLSWickingFlux(FaceKernel):
    """POR_LIQ_FLUX_FILL (``src/mm_fill_porous.c:10928 por_liq_flux_fill``):
    level-set-gated liquid wicking into a porous substrate at a
    fluid<->porous boundary,

        q = -perm_c (1 - H(F)) (p_liq - pc1) - tau dp_liq/dt

    — the porous liquid pressure relaxes toward the capillary pickup
    pressure pc1 wherever the LS says liquid wets the boundary (H(F) = 0
    side), with the tau damping of the reference. Register the fill field
    on the porous block (shared nodes / PassiveVar)."""

    def __init__(self, perm_c: float, pc1: float, tau: float = 0.0,
                 eps=None, var: str = "porous_pressure", comp: int = 0,
                 ncomp: int = 1, fill_var: str = "fill"):
        super().__init__(var, ncomp)
        self.perm_c, self.pc1, self.tau = perm_c, pc1, tau
        self.eps = eps
        self.comp = comp
        self.fill_var = fill_var

    def residual(self, sfv, mat, params):
        from goma_tpu.physics.level_set import heaviside

        nq = sfv.x.shape[0]
        eps = self.eps if self.eps is not None else params["ls_eps"]
        H = heaviside(sfv.val[self.fill_var][:, 0], eps)
        p = sfv.val[self.var][:, self.comp]
        q = -self.perm_c * (1.0 - H) * (p - self.pc1) \
            - self.tau * sfv.dot[self.var][:, self.comp]
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        # weak flux into the porous liquid-pressure rows (reference adds
        # func directly; our diffusion weak form takes -phi q_n)
        return out.at[:, self.comp, :].set(-q[:, None] * phi)


class PorousConvection(FaceKernel):
    """POROUS_CONV (``src/mm_fill_porous.c:3984 porous_convection_bc``):
    convective mass transfer from a deforming (Lagrangian, mesh-inertia)
    porous medium — the solid-phase convection velocity carries solvent
    mass through the boundary:

        func = + n . vconv * rho          (POROUS_SATURATED)
        func = - n . vconv * rho_bulk     (unsaturated)

    weak on the porous liquid-pressure rows. ``vconv``: material key
    ``solid_convection`` (callable(sfv, mat, params) -> (nq, dim) or a
    constant vector — the reference's ``get_convection_velocity``);
    defaults to the mesh velocity when the mesh variable is transient.
    ``rho``/``rho_bulk``: material keys ``rho`` / ``bulk_density``
    (constant or callable)."""

    def __init__(self, saturated: bool = True, comp: int = 0,
                 ncomp: int = 1, var: str = POR_VAR):
        super().__init__(var, ncomp)
        self.saturated = saturated
        self.comp = comp

    def residual(self, sfv, mat, params):
        from goma_tpu.fem.fields import MESH_VAR

        nq = sfv.x.shape[0]
        dim = sfv.x.shape[1]
        v = mat.get("solid_convection", None)
        if v is None:
            v = sfv.dot[MESH_VAR] if MESH_VAR in sfv.dot else \
                jnp.zeros((nq, dim), dtype=sfv.x.dtype)
        elif callable(v):
            v = v(sfv, mat, params)
        else:
            v = jnp.broadcast_to(
                jnp.asarray(v, dtype=sfv.x.dtype), (nq, dim))
        vn = jnp.einsum("qk,qk->q", v, sfv.normal)
        if self.saturated:
            rho = prop(mat, "rho", sfv, params, 1.0)
            func = rho * vn
        else:
            rb = mat.get("bulk_density", 1.0)
            rb = rb(sfv, mat, params) if callable(rb) else rb
            func = -rb * vn
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(func[:, None] * phi)


def porous_gas_gen_leak(dens_vap: float, var: str = POR_VAR, comp: int = 0):
    """VN_POROUS (``src/mm_fill_porous.c:4124 porous_normal_velocity_bc``):
    fluid-side normal velocity generated by solvent vapor leaving an
    adjacent porous solid,

        n . v = n . j_rel / dens_vap,
        j_rel = -rho_l (k/mu_l) (grad p_liq - rho_l g)

    (the Darcy relative mass flux of liquid solvent, the reference's
    ``pmv->rel_mass_flux``). Returns a ``leak`` callable for
    :class:`VNormLeak` on the momentum rows; register the porous pressure
    on the fluid block (shared nodes / ``PassiveVar``). Material keys:
    ``k_over_mu`` (mobility k/mu_l), ``rho_liq``, optional ``gravity``."""

    def leak(sfv, mat, params):
        gp = sfv.grad[var][:, comp, :]
        kmu = prop(mat, "k_over_mu", sfv, params, 1.0)
        rho_l = mat.get("rho_liq", 1.0)
        drive = gp
        g = mat.get("gravity", None)
        if g is not None:
            drive = drive - rho_l * jnp.asarray(g, dtype=sfv.x.dtype)[None, :]
        j = -rho_l * kmu * drive if jnp.ndim(kmu) == 0 else \
            -rho_l * kmu[:, None] * drive
        return jnp.einsum("qk,qk->q", j, sfv.normal) / dens_vap

    return leak
