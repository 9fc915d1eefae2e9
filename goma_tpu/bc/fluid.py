"""Named fluid / thermal / species boundary-condition catalog.

Parity: the most-used cards of the reference's big fluid-BC file
(``src/mm_ns_bc.c``: VELO_SLIP ``fvelo_slip_bc``, FLOW_PRESSURE /
FLOW_HYDROSTATIC ``fflow_*``), the heat-flux family of ``src/bc_integ.c``
(QCONV, QRAD), species mass-transfer fluxes (YFLUX, ``src/mm_ns_bc.c``
``mass_flux_surf_mtc``), and the contact-line endpoint forces of
``src/bc_special.c`` (CAP_ENDFORCE, CA) built on ``Problem.add_point_load``.

All are thin AD-differentiated weak kernels: the reference's hand-coded BC
Jacobian blocks come for free from jacfwd of the face/point residual.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.fem.fields import MESH_VAR
from goma_tpu.physics.materials import prop


class NavierSlip(FaceKernel):
    """VELO_SLIP (``src/mm_ns_bc.c fvelo_slip_bc``): Navier slip law
    t . sigma . n = -(1/beta) (u - u_wall) . t, entering the momentum weak
    form as + int phi (1/beta) (u - u_wall) dG projected tangentially
    (``tangential_only=True``, the VELO_SLIP_ROT behavior with rotated
    no-penetration handled separately) or applied to all components (the
    raw VELO_SLIP card, which relies on a separate normal condition)."""

    def __init__(self, dim: int, beta: float, u_wall=0.0,
                 tangential_only: bool = True):
        super().__init__("velocity", dim)
        self.dim = dim
        self.beta = beta
        self.u_wall = u_wall
        self.tangential_only = tangential_only

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        uw = self.u_wall(sfv, mat, params) if callable(self.u_wall) else self.u_wall
        uw = jnp.broadcast_to(jnp.asarray(uw, dtype=sfv.x.dtype), (nq, self.dim))
        du = sfv.val["velocity"] - uw
        if self.tangential_only:
            n = sfv.normal
            du = du - jnp.einsum("qk,qk->q", n, du)[:, None] * n
        phi = sfv.phi["velocity"]
        return (1.0 / self.beta) * jnp.einsum("qa,qi->qai", du, phi)


class FlowPressure(FaceKernel):
    """FLOW_PRESSURE / FLOW_HYDROSTATIC (``src/mm_ns_bc.c``): open boundary
    with imposed normal traction sigma.n = -P n, P = p0 + rho g.(x - x0).
    Weak momentum term: + int phi P n dG (the boundary term of the
    divergence-form momentum equation with sigma.n replaced)."""

    def __init__(self, dim: int, p0=0.0, rho: float = 0.0, g=None, x0=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.p0 = p0
        self.rho = rho
        self.g = np.zeros(dim) if g is None else np.asarray(g, dtype=float)
        self.x0 = np.zeros(dim) if x0 is None else np.asarray(x0, dtype=float)

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        p0 = self.p0(sfv, mat, params) if callable(self.p0) else self.p0
        P = jnp.broadcast_to(jnp.asarray(p0, dtype=sfv.x.dtype), (nq,))
        if self.rho:
            P = P + self.rho * jnp.einsum(
                "qk,k->q", sfv.x - jnp.asarray(self.x0, dtype=sfv.x.dtype),
                jnp.asarray(self.g, dtype=sfv.x.dtype))
        phi = sfv.phi["velocity"]
        return jnp.einsum("q,qa,qi->qai", P, sfv.normal, phi)


class ConvectiveHeatFlux(FaceKernel):
    """QCONV (``src/bc_integ.c``): q_n = h (T - T_inf) out of the domain;
    weak energy term + int phi h (T - T_inf) dG."""

    def __init__(self, h: float, T_inf: float, var: str = "temperature"):
        super().__init__(var, 1)
        self.h = h
        self.T_inf = T_inf

    def residual(self, sfv, mat, params):
        T = sfv.val[self.var][:, 0]
        phi = sfv.phi[self.var]
        return (self.h * (T - self.T_inf))[:, None, None] * phi[:, None, :]


class RadiativeHeatFlux(FaceKernel):
    """QRAD (``src/bc_integ.c``): q_n = h (T - T_s) + eps*sigB*(T^4 - T_s^4)."""

    def __init__(self, h: float, T_s: float, eps: float = 0.0,
                 sigB: float = 5.670374419e-8, var: str = "temperature"):
        super().__init__(var, 1)
        self.h, self.T_s, self.eps, self.sigB = h, T_s, eps, sigB

    def residual(self, sfv, mat, params):
        T = sfv.val[self.var][:, 0]
        q = self.h * (T - self.T_s) + self.eps * self.sigB * (T**4 - self.T_s**4)
        phi = sfv.phi[self.var]
        return q[:, None, None] * phi[:, None, :]


class MassTransferFlux(FaceKernel):
    """YFLUX with a mass-transfer coefficient (``src/mm_ns_bc.c``
    ``mass_flux_surf_mtc``): q_n = k_mtc (c_i - c_inf) for species
    component ``comp``."""

    def __init__(self, k_mtc: float, c_inf: float, comp: int = 0,
                 var: str = "species", ncomp: int = 1):
        super().__init__(var, ncomp)
        self.k_mtc, self.c_inf, self.comp = k_mtc, c_inf, comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        c = sfv.val[self.var][:, self.comp]
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(
            (self.k_mtc * (c - self.c_inf))[:, None] * phi)


def cap_end_force(direction, sigma):
    """CAP_ENDFORCE (``src/bc_special.c``): surface-tension endpoint force
    sigma * m at a contact-line node, m the unit vector pointing out of the
    free surface along its tangent. Returns an f for
    ``Problem.add_point_load(nodeset, "velocity", f)``; the weak form adds
    -phi . (sigma m) at the node (phi = 1 there)."""
    m = np.asarray(direction, dtype=float)
    m = m / np.linalg.norm(m)

    def f(q, X0, params):
        s = sigma(params) if callable(sigma) else sigma
        return -s * jnp.asarray(m)

    return f


def contact_angle_force(wall_tangent, wall_normal, theta, sigma):
    """CA (``src/bc_special.c`` contact-angle condition, weak endpoint form):
    replace the free-surface endpoint tension by sigma * m(theta) with
    m = cos(theta) t_w + sin(theta) n_w (t_w pointing out of the wetted wall,
    n_w into the fluid) — equilibrium then enforces the static contact angle
    theta against the wall. Use as a point load on the momentum equation."""
    t_w = np.asarray(wall_tangent, dtype=float)
    t_w = t_w / np.linalg.norm(t_w)
    n_w = np.asarray(wall_normal, dtype=float)
    n_w = n_w / np.linalg.norm(n_w)

    def f(q, X0, params):
        th = theta(params) if callable(theta) else theta
        s = sigma(params) if callable(sigma) else sigma
        m = jnp.cos(th) * jnp.asarray(t_w) + jnp.sin(th) * jnp.asarray(n_w)
        return -s * m

    return f


class PowerLawSlip(FaceKernel):
    """VELO_SLIP_POWER / VELO_SLIP_POWER_CARD (``src/mm_ns_bc.c:3553
    fvelo_slip_power_bc``): nonlinear slip law

        n . sigma = -(1/beta) (t . (u - u_s))^m  t

    — wall traction a power m of the tangential slip speed. ``tangent``
    fixes t (the CARD variant / 3D requirement); omitted, t is the surface
    tangent (2D). The m=1 case reduces exactly to :class:`NavierSlip`."""

    def __init__(self, dim: int, beta: float, m: float, u_wall=0.0,
                 tangent=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.beta = beta
        self.m = m
        self.u_wall = u_wall
        self.tangent = None if tangent is None else np.asarray(
            tangent, dtype=float)

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        uw = self.u_wall(sfv, mat, params) if callable(self.u_wall) \
            else self.u_wall
        uw = jnp.broadcast_to(jnp.asarray(uw, dtype=sfv.x.dtype),
                              (nq, self.dim))
        du = sfv.val["velocity"] - uw
        if self.tangent is not None:
            t = jnp.broadcast_to(jnp.asarray(self.tangent,
                                             dtype=sfv.x.dtype),
                                 (nq, self.dim))
        else:
            t = sfv.tangents[:, :, 0]
            t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        s = jnp.einsum("qk,qk->q", t, du)
        # signed power |s|^(m-1) s keeps the law odd (drag opposes slip)
        # and AD-safe at s = 0 for m >= 1
        mag = jnp.sqrt(s * s + 1e-30)
        tr = (1.0 / self.beta) * mag ** (self.m - 1.0) * s
        phi = sfv.phi["velocity"]
        return jnp.einsum("q,qk,qi->qki", tr, t, phi)


class ElectrokineticSlip(FaceKernel):
    """VELO_SLIP_EK / VELO_STREAMING (``src/mm_ns_bc.c:2276
    fvelo_slip_electrokinetic_bc``): Helmholtz-Smoluchowski electroosmotic
    wall slip — the tangential fluid velocity is driven to

        u_HS = -(eps_perm * zeta / mu) (grad V . t)

    The reference enforces t.v = u_HS strongly on the rotated tangent row;
    here the same limit is reached through a weak slip term
    (1/beta)(t.u - u_HS) with small beta, keeping the condition one
    AD-differentiated face kernel (grad V enters the Jacobian for free)."""

    def __init__(self, dim: int, permittivity: float, zeta: float,
                 beta: float = 1e-6, potential_var: str = "voltage"):
        super().__init__("velocity", dim)
        self.dim = dim
        self.permittivity = permittivity
        self.zeta = zeta
        self.beta = beta
        self.potential_var = potential_var

    def residual(self, sfv, mat, params):
        t = sfv.tangents[:, :, 0]
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        gV = sfv.grad[self.potential_var][:, 0, :]
        mu = prop(mat, "mu", sfv, params)
        u_hs = -(self.permittivity * self.zeta / mu) * jnp.einsum(
            "qk,qk->q", gV, t)
        s = jnp.einsum("qk,qk->q", t, sfv.val["velocity"]) - u_hs
        phi = sfv.phi["velocity"]
        return (1.0 / self.beta) * jnp.einsum("q,qk,qi->qki", s, t, phi)


class LevelSetSlip(FaceKernel):
    """VELO_SLIP_FILL / VELO_SLIP_LEVEL / VELO_SLIP_LS_HEAVISIDE /
    VELO_SLIP_ROT_FILL / VELO_SLIP_LEVEL_SIC (``src/mm_ns_bc.c:113
    fvelo_slip_level``): slip coefficient modulated by the level-set /
    fill field so the wall switches between a wetted (no-slip-like,
    ``beta_wet``) and a dry / near-contact-line (``beta_dry``) slip length:

        beta_eff = beta_wet * H_eps(F) + beta_dry * (1 - H_eps(F))

    with H_eps the smoothed Heaviside over half-width ``eps_ls``. This is
    the standard contact-line stress regularization for LS wetting flows.
    ``tangential_only=False`` gives the _FILL variants that damp all
    components (relying on a separate normal condition)."""

    def __init__(self, dim: int, beta_wet: float, beta_dry: float,
                 eps_ls: float, u_wall=0.0, ls_var: str = "fill",
                 tangential_only: bool = True):
        super().__init__("velocity", dim)
        self.dim = dim
        self.beta_wet = beta_wet
        self.beta_dry = beta_dry
        self.eps_ls = eps_ls
        self.u_wall = u_wall
        self.ls_var = ls_var
        self.tangential_only = tangential_only

    def residual(self, sfv, mat, params):
        from goma_tpu.physics.level_set import heaviside

        nq = sfv.x.shape[0]
        uw = self.u_wall(sfv, mat, params) if callable(self.u_wall) \
            else self.u_wall
        uw = jnp.broadcast_to(jnp.asarray(uw, dtype=sfv.x.dtype),
                              (nq, self.dim))
        du = sfv.val["velocity"] - uw
        if self.tangential_only:
            n = sfv.normal
            du = du - jnp.einsum("qk,qk->q", n, du)[:, None] * n
        H = heaviside(sfv.val[self.ls_var][:, 0], self.eps_ls)
        beta_eff = self.beta_wet * H + self.beta_dry * (1.0 - H)
        phi = sfv.phi["velocity"]
        return jnp.einsum("qa,qi->qai", du / beta_eff[:, None], phi)


class LSNoPenetration(FaceKernel):
    """VELO_NORMAL_LS / VELO_NORMAL_LS_PETROV / VELO_NORMAL_LS_COLLOC and
    VELO_TANGENT_LS (``src/mm_ns_bc.c:355 fvelo_normal_bc`` "fake gas
    outlet" modification, ``:845 fvelo_tangential_ls_bc``): the
    no-penetration (or tangential-velocity) condition

        n.(v - xdot) = v_n     (t.(v - xdot) = v_t with tangential=True)

    weighted by a level-set gate: full penalty on the liquid side, zero in
    the gas phase (the boundary becomes a free outlet for the gas), with
    the smooth Heaviside transition of half-width ``length`` (optionally
    shifted by ``shift``) and a leak-angle gate that opens the boundary
    when the interface meets it steeper than ``leak_angle_deg`` (measured
    as in the reference: cos_leak = cos(180 - angle), transition width
    sin(180 - angle) sin(10 deg)).

    ``liquid_negative`` maps the reference's viscositymask sign: True means
    F < 0 is the liquid (penalized) phase. The strong rotated-row
    application of the reference becomes a normal-projected penalty kernel
    here (same converged constraint)."""

    def __init__(self, dim: int, vnormal=0.0, length: float = 0.1,
                 shift: float = 0.0, leak_angle_deg: float = 135.0,
                 liquid_negative: bool = True, tangential: bool = False,
                 penalty: float = 1e6, ls_var: str = "fill"):
        super().__init__("velocity", dim)
        self.dim = dim
        self.vnormal = vnormal
        self.length = length
        self.shift = shift
        self.leak_angle_deg = leak_angle_deg
        self.liquid_negative = liquid_negative
        self.tangential = tangential
        self.penalty = penalty
        self.ls_var = ls_var

    def residual(self, sfv, mat, params):
        from goma_tpu.physics.level_set import heaviside

        nq = sfv.x.shape[0]
        sgn = 1.0 if self.liquid_negative else -1.0
        F = sfv.val[self.ls_var][:, 0]
        Fp = F / self.length + sgn * self.shift
        H = heaviside(Fp, 1.0)
        # liquid_negative (visc_sens=+1): pen_F = 1 - H (liquid F<0 -> 1)
        pen_F = 1.0 - H if self.liquid_negative else H

        # leak-angle gate (fvelo_normal_bc): open the boundary where the
        # interface normal turns past the leak angle
        ang = jnp.deg2rad(180.0 - self.leak_angle_deg)
        cos_leak = jnp.cos(ang)
        leak_w = jnp.sin(ang) * jnp.sin(jnp.deg2rad(10.0))
        gF = sfv.grad[self.ls_var][:, 0, :]
        n_ls = gF / jnp.sqrt(jnp.sum(gF * gF, axis=1) + 1e-30)[:, None]
        dot = jnp.einsum("qk,qk->q", sfv.normal, n_ls)
        Hleak = heaviside((dot - cos_leak) / leak_w, 1.0)
        gate = jnp.where(jnp.abs(Fp) < 1.0,
                         jnp.where(dot >= cos_leak + leak_w, 0.0,
                                   1.0 - Hleak * (dot > cos_leak - leak_w)),
                         1.0)
        pen_F = pen_F * gate

        v = sfv.val["velocity"]
        if MESH_VAR in sfv.dot:
            v = v - sfv.dot[MESH_VAR]
        if self.tangential:
            if self.dim == 2:
                # reference tangent convention (mm_fill_aux.c
                # calc_surf_tangent): stangent[0] = (-n_y, n_x)
                n = sfv.normal
                d = jnp.stack([-n[:, 1], n[:, 0]], axis=1)
            else:
                d = sfv.tangents[:, :, 0]
                d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        else:
            d = sfv.normal
        vn = self.vnormal(sfv, mat, params) if callable(self.vnormal) \
            else self.vnormal
        s = jnp.einsum("qk,qk->q", d, v) - vn
        phi = sfv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", pen_F * s, d, phi)


class SlipHeating(FaceKernel):
    """Q_VELO_SLIP (``src/mm_ns_bc.c qside_directional`` family): frictional
    heating at a slip wall — the slip work (1/beta)|u_t - u_s|^2 enters the
    energy equation as an INCOMING surface heat flux (sign: heating)."""

    def __init__(self, dim: int, beta: float, u_wall=0.0,
                 var: str = "temperature"):
        super().__init__(var, 1)
        self.dim = dim
        self.beta = beta
        self.u_wall = u_wall

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        uw = self.u_wall(sfv, mat, params) if callable(self.u_wall) \
            else self.u_wall
        uw = jnp.broadcast_to(jnp.asarray(uw, dtype=sfv.x.dtype),
                              (nq, self.dim))
        du = sfv.val["velocity"] - uw
        n = sfv.normal
        dut = du - jnp.einsum("qk,qk->q", n, du)[:, None] * n
        q = -(1.0 / self.beta) * jnp.einsum("qk,qk->q", dut, dut)
        phi = sfv.phi[self.var]
        return q[:, None, None] * phi[:, None, :]


class QVaporFlux(FaceKernel):
    """Q_VAPOR (``src/bc_integ.c:1486`` -> ``calculate_vapor_cool``,
    ``src/mm_ns_bc.c:14609``): evaporative cooling of a free surface —
    the Kanouff curve-fit energy loss leaves through the boundary
    (positive weak term = outflux)."""

    def __init__(self, T_boil: float, T_scale: float = 1.0,
                 q_scale: float = 1.0, var: str = "temperature"):
        super().__init__(var, 1)
        from goma_tpu.physics.level_set import vapor_cool
        self._q = vapor_cool(T_boil, T_scale, q_scale)

    def residual(self, sfv, mat, params):
        q = self._q(sfv.val[self.var][:, 0])
        phi = sfv.phi[self.var]
        return q[:, None, None] * phi[:, None, :]


class LaserWeldFlux(FaceKernel):
    """Q_LASER_WELD (``src/bc_integ.c:1482`` -> ``calculate_laser_flux``,
    ``src/mm_ns_bc.c:14757``): traveling-Gaussian laser beam heating of
    the surface, optionally with the |n . beam_dir| incidence factor and
    combined evaporative cooling (the reference pairs them on keyhole
    welds; pass ``T_boil`` to enable)."""

    def __init__(self, power: float, radius: float, center,
                 beam_velocity=None, absorptivity: float = 1.0,
                 e_concen: float = 0.4522, beam_dir=None,
                 T_boil: float = None, T_scale: float = 1.0,
                 q_scale: float = 1.0, var: str = "temperature"):
        super().__init__(var, 1)
        from goma_tpu.physics.level_set import laser_flux, vapor_cool
        self._laser = laser_flux(power, radius, center, beam_velocity,
                                 absorptivity, e_concen)
        self.beam_dir = None if beam_dir is None else (
            np.asarray(beam_dir, dtype=float)
            / np.linalg.norm(beam_dir))
        self._vapor = None if T_boil is None else vapor_cool(
            T_boil, T_scale, q_scale)

    def residual(self, sfv, mat, params):
        q_in = self._laser(sfv.x, params.get("time", 0.0))
        if self.beam_dir is not None:
            inc = jnp.abs(jnp.einsum(
                "qk,k->q", sfv.normal,
                jnp.asarray(self.beam_dir, dtype=sfv.x.dtype)))
            q_in = q_in * inc
        q_out = -q_in
        if self._vapor is not None:
            q_out = q_out + self._vapor(sfv.val[self.var][:, 0])
        phi = sfv.phi[self.var]
        return q_out[:, None, None] * phi[:, None, :]


class SpeciesKinematicFlux(FaceKernel):
    """KINEMATIC_SPECIES (``src/mm_fill_species.c:3542
    kinematic_species_bc``): convective species flux across a moving
    interface — replaces the outward diffusive flux with

        rho Y (v - xdot) . n - vnormal

    on the species rows (call from each side of a discontinuous-species
    interface; the two sides' terms assemble the jump balance). ``rho``
    from the material (default 1)."""

    def __init__(self, comp: int = 0, vnormal: float = 0.0,
                 var: str = "species", ncomp: int = 1):
        super().__init__(var, ncomp)
        self.comp = comp
        self.vnormal = vnormal

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        rho = prop(mat, "rho", sfv, params, 1.0)
        Y = sfv.val[self.var][:, self.comp]
        v = sfv.val["velocity"] if "velocity" in sfv.val else 0.0 * sfv.x
        if MESH_VAR in sfv.dot:
            v = v - sfv.dot[MESH_VAR]
        un = jnp.einsum("qk,qk->q", v, sfv.normal)
        q = rho * Y * un - self.vnormal
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(q[:, None] * phi)


class LatentHeatInternal(FaceKernel):
    """LATENT_HEAT_INTERNAL (``src/mm_fill_species.c`` ``lat_heat_internal_bc``,
    dispatched src/bc_integ.c:1609): latent heat released/absorbed at an
    internal moving surface (Lagrangian melting front):

        q_n = rho L n . (v - xdot)

    added weakly to the energy rows."""

    def __init__(self, L_heat: float, var: str = "temperature"):
        super().__init__(var, 1)
        self.L_heat = L_heat

    def residual(self, sfv, mat, params):
        rho = prop(mat, "rho", sfv, params, 1.0)
        v = sfv.val["velocity"] if "velocity" in sfv.val else 0.0 * sfv.x
        if MESH_VAR in sfv.dot:
            v = v - sfv.dot[MESH_VAR]
        un = jnp.einsum("qk,qk->q", v, sfv.normal)
        q = rho * self.L_heat * un
        phi = sfv.phi[self.var]
        return (q[:, None] * phi)[:, None, :]


class DvzdrZero(FaceKernel):
    """DVZDR_ZERO (``src/bc_colloc.c:693 dvzdr_zero_deriv_bc``): swirling
    flow symmetry collocation n_wall . grad(v_theta) = 0 at a wall —
    applied as a penalty on the swirl-momentum rows (the swirl velocity is
    its own scalar variable here, :class:`SwirlMomentum`). ``nwall`` is
    the card's wall direction (the reference's Float[1..3])."""

    def __init__(self, nwall, var: str = "swirl", penalty: float = 1e6):
        super().__init__(var, 1)
        self.nwall = np.asarray(nwall, dtype=float)
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        gw = sfv.grad[self.var][:, 0, :]  # (nq, dim)
        nw = jnp.asarray(self.nwall[: gw.shape[1]], dtype=sfv.x.dtype)
        s = jnp.einsum("qk,k->q", gw, nw)
        phi = sfv.phi[self.var]
        return self.penalty * (s[:, None] * phi)[:, None, :]


class AirFilmSlip(FaceKernel):
    """AIR_FILM / AIR_FILM_ROT (``src/mm_ns_bc.c:3760 fvelo_airfilm_bc``):
    air-lubrication drag between a web and a moving (or rotating)
    substrate: the wall traction is the gas-film shear

        t = gas_mu (u - v_s)                      (gas_flow = 0)
        t = gas_mu (u - v_s)(u + v_s)/gas_flow    (finite gas_flow)

    with the substrate velocity v_s constant (AIR_FILM) or the rigid
    rotation omega x (x - X0) (AIR_FILM_ROT; positive omega clockwise as
    in the reference). The gas_flow branch models the flow-rate-limited
    film. Reduces exactly to :class:`NavierSlip` (beta = 1/gas_mu,
    tangential_only=False) for gas_flow = 0."""

    def __init__(self, dim: int, gas_mu: float, v_s=(0.0, 0.0),
                 gas_flow: float = 0.0, rotation=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.gas_mu = gas_mu
        self.v_s = np.asarray(v_s, dtype=float)
        self.gas_flow = gas_flow
        self.rotation = rotation  # (omega, x0, y0)

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        if self.rotation is not None:
            om, x0, y0 = self.rotation
            vs = jnp.stack([om * (sfv.x[:, 1] - y0),
                            -om * (sfv.x[:, 0] - x0)], axis=1)
        else:
            vs = jnp.broadcast_to(
                jnp.asarray(self.v_s[: self.dim], dtype=sfv.x.dtype),
                (nq, self.dim))
        u = sfv.val["velocity"]
        vrel = u - vs
        if self.gas_flow:
            vrel = vrel * (u + vs) / self.gas_flow
        phi = sfv.phi["velocity"]
        return self.gas_mu * jnp.einsum("qa,qi->qai", vrel, phi)
