"""Dynamic contact-angle / wetting-speed boundary conditions (level-set
form) and free-surface wall repulsion.

Parity: the reference's diffuse-interface wetting BCs in ``src/mm_ns_bc.c``
— WETTING_SPEED_LINEAR / WETTING_SPEED_BLAKE (``:12616`` ``wet_speed = v0 *
sinh(g * (cos_ca_static - cos_ca))``) / WETTING_SPEED_HOFFMAN (the Hoffman
correlation solves at ``:12598-12650``), applied over the diffuse interface
band on a wall sideset as ``wet_vector = t * wet_speed * delta(F)`` with a
slip coefficient ``1/depth`` — plus CAP_REPULSE (``:5489``: repulsive
normal traction ``-P_rep / (dist/hscale)^repexp`` keeping a free surface
off a solid). The reference hand-codes every Jacobian block
(``d_wet_speed_dFj`` etc., ``:12719-12790``); here jacfwd differentiates
the whole kernel, including the LS-normal and mesh sensitivities.

The dynamic contact angle comes from the level-set normal at the wall:
``cos(theta_d) = n_wall . n_fluid`` with ``n_fluid = grad F / |grad F|``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.physics.level_set import FILL_VAR, delta


def hoffman_correlation_ca(cos_theta, n_iter: int = 40):
    """Solve the Hoffman correlation Ca(theta) by the reference's Newton
    iteration (``src/mm_ns_bc.c:12598``):  find ca with
    ``ca - 1.31 ca^0.99 A - A = 0``, ``A = [log((3 - c)/(1 + c)) /
    (2 * 5.16)]^(1/0.706)`` where c = cos(theta). Fixed iteration count
    (jit/AD-friendly); converges far faster than 40 steps in practice."""
    c = jnp.clip(cos_theta, -0.999999, 0.999999)
    A = (jnp.log((3.0 - c) / (1.0 + c)) / (2.0 * 5.16)) ** (1.0 / 0.706)
    ca = jnp.full_like(A, 1.0e6)
    for _ in range(n_iter):
        f = ca - 1.31 * ca**0.99 * A - A
        df = 1.0 - 1.31 * 0.99 * A / ca**0.01
        ca = ca - f / df
    return ca


# 10-point Gauss rule of the reference's Cox integral (mm_ns_bc.c:10454)
_COX_GPT = np.array([
    -0.973906528517172, -0.865063366688985, -0.679409568299024,
    -0.433395394129247, -0.148874338981631, 0.148874338981631,
    0.433395394129247, 0.679409568299024, 0.865063366688985,
    0.973906528517172])
_COX_WT = np.array([
    0.066671344308688, 0.149451349150581, 0.219086362515982,
    0.269266719309996, 0.295524224714753, 0.295524224714753,
    0.269266719309996, 0.219086362515982, 0.149451349150581,
    0.066671344308688])


def cox_f(th, lam):
    """Cox's hydrodynamic angle function f(theta, lambda)
    (``src/mm_ns_bc.c:10594-10640``): the local Ca-per-dtheta kernel of
    the Cox (1986) matched-asymptotics wetting analysis; ``lam`` is the
    displaced/displacing viscosity ratio."""
    s, c = jnp.sin(th), jnp.cos(th)
    pi = np.pi
    f_num = 2.0 * s * (lam**2 * (th**2 - s**2)
                       + 2.0 * lam * (th * (pi - th) + s**2)
                       + ((pi - th) ** 2 - s**2))
    f_den = (lam * (th**2 - s**2) * (pi - th + s * c)
             + ((pi - th) ** 2 - s**2) * (th - s * c))
    return f_num / f_den


def cox_wetting_ca(theta, theta_eq, lam=0.0, eps_slip=0.01,
                   q_inner=0.0, q_outer=0.0):
    """Capillary number of the Cox dynamic-contact-angle relation
    (VELO_THETA_COX, ``src/mm_ns_bc.c:10594``):

        Ca = [int_theta_eq^theta dth / f(th, lam)] /
             [ln(1/eps_slip) + q_i/f(theta_eq) - q_o/f(theta)]

    evaluated with the reference's fixed 10-point Gauss rule (jit- and
    AD-friendly: no data-dependent control flow)."""
    theta = jnp.asarray(theta)
    th = theta_eq + (theta[..., None] - theta_eq) * (
        jnp.asarray(_COX_GPT) + 1.0) / 2.0
    g_int = (1.0 / cox_f(th, lam)) @ jnp.asarray(_COX_WT)
    g_int = g_int * 0.5 * (theta - theta_eq)
    den = (np.log(1.0 / eps_slip) + q_inner / cox_f(theta_eq, lam)
           - q_outer / cox_f(theta, lam))
    return g_int / den


def shik_wetting_speed(costheta, costheta_eq, theta_max, v0, g):
    """Shikhmurzaev interface-formation wetting speed (VELO_THETA_SHIK,
    ``src/mm_ns_bc.c:10631-10638``):

        u0(th)  = (sin th - th cos th) / (sin th cos th - th)
        rhs     = (cos th_eq - cos th) /
                  [(v0 - 1)(u0(th) - u0(th_max)) + cos th - cos th_max]
        V       = sqrt(g v0) rhs / (2 sqrt(1 + rhs))

    with the reference's runaway guard th_max -> min(1.01 th, pi) when
    th exceeds th_max."""
    th = jnp.arccos(jnp.clip(costheta, -0.999999, 0.999999))
    th_max = jnp.where(th > theta_max,
                       jnp.minimum(1.01 * th, np.pi), theta_max)
    s, c = jnp.sin(th), jnp.cos(th)
    sm, cm = jnp.sin(th_max), jnp.cos(th_max)
    u0 = (s - th * c) / (s * c - th)
    u0m = (sm - th_max * cm) / (sm * cm - th_max)
    rhs = (costheta_eq - costheta) / ((v0 - 1.0) * (u0 - u0m)
                                      + costheta - cm)
    return jnp.sqrt(g * v0) * rhs / (2.0 * jnp.sqrt(jnp.maximum(
        1.0 + rhs, 1e-12)))


class LSWettingSpeed(FaceKernel):
    """Diffuse-interface dynamic-contact-angle wetting BC on a wall sideset
    (momentum equation): adds

        (1/depth) * delta_alpha(F) * (u - t * V_wet(theta_d)) . phi_i

    with t the contact-line tangent (projection of the fluid-interface
    normal onto the wall) and the wetting speed model:

      model="linear":  V = (cos(theta_s) - cos(theta_d)) / beta
      model="blake":   V = v0 * sinh(g * (cos(theta_s) - cos(theta_d)))
      model="hoffman": V = g/mu * (Ca(theta_d) - Ca(theta_s))  [correlation]
      model="cox":     V = g/mu * Ca_cox(theta_d; lam, eps_slip)  [Cox 1986
                       matched asymptotics, VELO_THETA_COX]
      model="shik":    V from the Shikhmurzaev interface-formation relation
                       (VELO_THETA_SHIK; v0 = dimensionless parameter,
                       theta_max_deg = runaway cap)

    Reference cards: WETTING_SPEED_LINEAR / _BLAKE / _HOFFMAN and the
    VELO_THETA_TPL / _HOFFMAN / _COX / _SHIK family
    (src/mm_ns_bc.c:10482-10640, 12616ff).
    """

    def __init__(self, dim: int, theta_s_deg: float, alpha: float,
                 model: str = "blake", v0: float = 1.0, g: float = 1.0,
                 beta: float = 1.0, depth: float = 1.0, mu: float = 1.0,
                 lam: float = 0.0, eps_slip: float = 0.01,
                 theta_max_deg: float = 180.0):
        super().__init__("velocity", dim)
        self.dim = dim
        self.theta_s = float(np.deg2rad(theta_s_deg))
        self.cos_ts = float(np.cos(self.theta_s))
        self.alpha = alpha
        self.model = model
        self.v0, self.g, self.beta, self.depth, self.mu = v0, g, beta, depth, mu
        self.lam, self.eps_slip = lam, eps_slip
        self.theta_max = float(np.deg2rad(theta_max_deg))
        if model not in ("linear", "blake", "hoffman", "cox", "shik"):
            raise ValueError(f"unknown wetting model {model!r}")

    def wet_speed(self, cos_ca):
        if self.model == "linear":
            return (self.cos_ts - cos_ca) / self.beta
        if self.model == "blake":
            return self.v0 * jnp.sinh(self.g * (self.cos_ts - cos_ca))
        if self.model == "cox":
            theta = jnp.arccos(jnp.clip(cos_ca, -0.999999, 0.999999))
            ca = cox_wetting_ca(theta, self.theta_s, lam=self.lam,
                                eps_slip=self.eps_slip)
            return (self.g / self.mu) * ca
        if self.model == "shik":
            return shik_wetting_speed(cos_ca, self.cos_ts, self.theta_max,
                                      self.v0, self.g)
        ca_d = hoffman_correlation_ca(-cos_ca)
        ca_s = hoffman_correlation_ca(-jnp.asarray(self.cos_ts))
        return (self.g / self.mu) * (ca_d - ca_s)

    def residual(self, sfv, mat, params):
        F = sfv.val[FILL_VAR][:, 0]
        gF = sfv.grad[FILL_VAR][:, 0, :]
        nf = gF / jnp.maximum(jnp.linalg.norm(gF, axis=1, keepdims=True), 1e-30)
        nw = sfv.normal
        cos_ca = jnp.einsum("qk,qk->q", nw, nf)
        tmag = jnp.sqrt(jnp.maximum(1.0 - cos_ca**2, 1e-20))
        t = (nf - cos_ca[:, None] * nw) / tmag[:, None]
        V = self.wet_speed(cos_ca)
        dl = delta(F, self.alpha)
        u = sfv.val["velocity"]
        mis = u - t * V[:, None]
        phi = sfv.phi["velocity"]
        return (dl / self.depth)[:, None, None] * jnp.einsum(
            "qa,qi->qai", mis, phi)


class CapRepulse(FaceKernel):
    """CAP_REPULSE (``src/mm_ns_bc.c:5489``): repulsive normal traction
    keeping a free surface from touching a solid boundary,

        force = -P_rep / (dist(x)/hscale)^repexp,

    added to the capillary traction (use together with CapillaryBC on the
    same sideset). ``dist_fn(x) -> (nq,)`` is the distance to the repelling
    geometry (the reference's user-geometry ``fnc``; e.g. a plane or roll
    surface — CAP_REPULSE_ROLL uses a circle). Optional ``betainv`` adds
    the matching distance-dependent slip resistance."""

    def __init__(self, dim: int, dist_fn, P_rep: float, hscale: float = 1.0,
                 repexp: float = 2.0, betainv: float = 0.0):
        super().__init__("velocity", dim)
        self.dim = dim
        self.dist_fn = dist_fn
        self.P_rep = P_rep
        self.hscale = hscale
        self.repexp = repexp
        self.betainv = betainv

    def residual(self, sfv, mat, params):
        dist = jnp.maximum(jnp.asarray(self.dist_fn(sfv.x)), 1e-12)
        force = -self.P_rep / (dist / self.hscale) ** self.repexp
        phi = sfv.phi["velocity"]
        n = sfv.normal
        # traction addition sigma.n += force * n -> weak term -phi force n
        out = -jnp.einsum("q,qa,qi->qai", force, n, phi)
        if self.betainv:
            invs = self.betainv / (dist / self.hscale) ** self.repexp
            u = sfv.val["velocity"]
            ut = u - jnp.einsum("qk,qk->q", n, u)[:, None] * n
            out = out + invs[:, None, None] * jnp.einsum("qa,qi->qai", ut, phi)
        return out


class RepulsiveForce(FaceKernel):
    """REP_FORCE / ATTR_FORCE family (``src/mm_fill_solid.c:1570
    rep_force_n_dot_f_bc``, roll variant :1725): a normal surface traction
    that keeps a deforming boundary away from (or attracts it toward) a
    wall:

        repulsive:  f = -pr / d(x)^m     (pushes away as d -> 0)
        attractive: f = +pr * d(x)^m     (pulls toward the wall)

    applied along the surface normal, optionally with a Coulomb-like
    tangential component ``friction * f``. ``d(x)``: distance to the plane
    a x + b y + c z + dp = 0, or any ``dist_fn(x) -> (nq,)`` (roll / table
    geometries — the _ROLL/_TABLE variants). ``var`` selects the equation
    (mesh, real solid, or momentum rows)."""

    def __init__(self, dim: int, pr: float, repexp: float = 4.0,
                 plane=None, dist_fn=None, friction: float = 0.0,
                 attract: bool = False, var: str = "mesh_displacement"):
        super().__init__(var, dim)
        self.dim = dim
        self.pr = pr
        self.repexp = repexp
        self.friction = friction
        self.attract = attract
        if (plane is None) == (dist_fn is None):
            raise ValueError("give exactly one of plane=(a,b,c,d) or "
                             "dist_fn")
        self.plane = None if plane is None else np.asarray(plane,
                                                           dtype=float)
        self.dist_fn = dist_fn

    def _dist(self, x):
        if self.dist_fn is not None:
            return self.dist_fn(x)
        p = jnp.asarray(self.plane, dtype=x.dtype)
        denom = jnp.sqrt(jnp.sum(p[: self.dim] ** 2))
        return jnp.abs(jnp.einsum("qk,k->q", x, p[: self.dim]) + p[3]) / denom

    def residual(self, sfv, mat, params):
        d = self._dist(sfv.x)
        if self.attract:
            f = self.pr * d ** self.repexp
        else:
            f = -self.pr / d ** self.repexp
        tvec = sfv.normal
        if self.friction:
            t1 = sfv.tangents[:, :, 0]
            t1 = t1 / jnp.linalg.norm(t1, axis=1, keepdims=True)
            tvec = tvec + self.friction * t1
        phi = sfv.phi[self.var]
        # weak form adds -phi f n (a traction, reference func[a] convention)
        return -jnp.einsum("q,qa,qi->qai", f, tvec, phi)


class HysteresisWetting(LSWettingSpeed):
    """HYSTERESIS_WETTING_BC: contact-line law with an advancing/receding
    hysteresis window — the contact line is PINNED (zero wetting speed)
    while the dynamic angle sits inside [theta_rec, theta_adv], advances
    linearly beyond theta_adv and recedes below theta_rec:

        V = (cos(theta_adv) - cos(theta_d))/beta_adv   if theta_d > theta_adv
            (cos(theta_rec) - cos(theta_d))/beta_rec   if theta_d < theta_rec
            0                                          otherwise

    The reference snapshot ABORTS on this card ("this model has not been
    included with this distribution", ``src/mm_ns_bc.c:15573``; the
    implementation lives in a non-distributed ``func_hysteresis_wet.h``) —
    this supplies the standard stick-slip window the card advertises,
    applied through the same delta-band velocity penalty as
    :class:`LSWettingSpeed`."""

    def __init__(self, dim: int, theta_adv_deg: float, theta_rec_deg: float,
                 alpha: float, beta_adv: float = 1.0, beta_rec: float = None,
                 depth: float = 1.0):
        if theta_rec_deg > theta_adv_deg:
            raise ValueError("receding angle must not exceed advancing")
        super().__init__(dim, theta_s_deg=theta_adv_deg, alpha=alpha,
                         model="linear", beta=beta_adv, depth=depth)
        self.cos_adv = float(np.cos(np.deg2rad(theta_adv_deg)))
        self.cos_rec = float(np.cos(np.deg2rad(theta_rec_deg)))
        self.beta_adv = beta_adv
        self.beta_rec = beta_adv if beta_rec is None else beta_rec

    def wet_speed(self, cos_ca):
        adv = (self.cos_adv - cos_ca) / self.beta_adv  # > 0 past theta_adv
        rec = (self.cos_rec - cos_ca) / self.beta_rec  # < 0 below theta_rec
        return jnp.where(cos_ca < self.cos_adv, adv,
                         jnp.where(cos_ca > self.cos_rec, rec, 0.0))


def _wall_contact_geometry(sfv, fill_var=FILL_VAR):
    """Shared geometry of the diffuse LS-wall contact band: band density
    delta(F)|grad F|, wall tangent t oriented by sign((n_ls x n_w)_z) in 2D
    (the reference's orientation pick, apply_CA_FILL src/mm_ns_bc.c:11362)
    or t = n_w x (n_ls x n_w)/|..| in 3D, and dp = t . n_ls."""
    F = sfv.val[fill_var][:, 0]
    gF = sfv.grad[fill_var][:, 0, :]
    mag = jnp.sqrt(jnp.sum(gF * gF, axis=1) + 1e-30)
    n_ls = gF / mag[:, None]
    nw = sfv.normal
    dim = nw.shape[1]
    if dim == 2:
        sign = jnp.sign(n_ls[:, 0] * nw[:, 1] - n_ls[:, 1] * nw[:, 0])
        sign = jnp.where(sign == 0, 1.0, sign)
        t = jnp.stack([sign * nw[:, 1], -sign * nw[:, 0]], axis=1)
    else:
        l = jnp.cross(n_ls, nw)
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=1, keepdims=True), 1e-30)
        t = jnp.cross(nw, l)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-30)
    dp = jnp.einsum("qk,qk->q", t, n_ls)
    return F, mag, n_ls, nw, t, dp


class FillContactAngle(FaceKernel):
    """FILL_CA (``src/mm_ns_bc.c:11306 apply_CA_FILL``): weak Young force
    applied to the fluid momentum in the diffuse LS-wall contact band,

        f = delta(F)|grad F| sigma (t . n_ls)
            (sin(theta_ca) n_w + cos(theta_ca) t)

    pulling the contact region toward the prescribed static angle. The band
    integral of delta |grad F| (t.n_ls) is exactly 1, so the total applied
    force is sigma (sin n_w + cos t) — the sharp Young traction. Sign
    convention matches ``cap_end_force`` (the sharp endpoint analog)."""

    def __init__(self, dim: int, theta_deg: float, sigma: float,
                 eps=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.theta = float(np.deg2rad(theta_deg))
        self.sigma = sigma
        self.eps = eps

    def force_dir(self, nw, t):
        return np.sin(self.theta) * nw + np.cos(self.theta) * t

    def residual(self, sfv, mat, params):
        eps = self.eps if self.eps is not None else params["ls_eps"]
        F, mag, n_ls, nw, t, dp = _wall_contact_geometry(sfv)
        dl = delta(F, eps) * mag
        f = (self.sigma * dl * dp)[:, None] * self.force_dir(nw, t)
        phi = sfv.phi["velocity"]
        return -jnp.einsum("qa,qi->qai", f, phi)


class WettingTension(FillContactAngle):
    """WETTING_TENSION (``src/mm_ns_bc.c:13556 apply_wetting_tension``):
    the tangential-only wetting tension W delta (t.n_ls) t — the
    theta_ca = 0 branch of :class:`FillContactAngle` with tension W."""

    def __init__(self, dim: int, wetting_tension: float, eps=None):
        super().__init__(dim, theta_deg=0.0, sigma=wetting_tension, eps=eps)
