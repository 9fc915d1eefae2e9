"""Lubrication (Reynolds film) equations.

Parity: reference shell-lubrication family ``src/mm_fill_shell.c``
(``assemble_lubrication`` LUBP equations) and ``src/mm_std_models_shell.c``
film closures. First implementation: the Reynolds equation solved on a 2D
(or 1D) domain parameterizing the film, with prescribed gap h(x, t) and
wall velocity U:

    div( h^3/(12 mu) grad p ) = U/2 . grad h + dh/dt

(incompressible, no-slip walls, no cavitation model yet — Goma's full shell
treatment on curved 3D shells with bulk coupling is a later stage).
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation, FaceKernel
from goma_tpu.physics.materials import prop

LUB_VAR = "lub_pressure"


class ReynoldsFilm(Equation):
    """Material keys: ``gap`` h(fv, mat, params) -> (nq,) (callable; may read
    fv.x and params["time"]), ``mu_lub``, ``wall_velocity`` (dim,) constant or
    callable. ``var``: solved pressure field — pass e.g. ``"lub_pressure_2"``
    for the reference's second-layer R_LUBP_2 equation
    (``assemble_lubrication(R_LUBP_2)``, ``src/mm_fill.c:2029``)."""

    def __init__(self, interp: str = "Q1", transient: bool = False,
                 var: str = LUB_VAR):
        super().__init__(var, 1, interp)
        self.transient = transient

    def residual(self, fv, mat, params):
        import jax as _jax

        LUB_VAR = self.var
        nq = fv.x.shape[0]
        gp = fv.grad[LUB_VAR][:, 0, :]
        mu = prop(mat, "mu_lub", fv, params, 1.0)
        hfun = mat["gap"]
        h = hfun(fv, mat, params) if callable(hfun) else jnp.broadcast_to(jnp.asarray(hfun), (nq,))
        U = mat.get("wall_velocity", None)

        gphi = fv.gphi[LUB_VAR]
        phi = fv.phi[LUB_VAR]
        mob = h**3 / (12.0 * mu)
        contrib = jnp.einsum("q,qk,qik->qi", mob, gp, gphi)

        if U is not None:
            Uv = U(fv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U), (nq, fv.x.shape[1])
            )
            # Couette term: -div(U h / 2) tested weakly -> + (U h/2) . grad(phi)
            contrib = contrib - 0.5 * jnp.einsum("qk,q,qik->qi", Uv, h, gphi)
        if self.transient:
            # squeeze term dh/dt via AD of gap in params["time"]
            def h_of_t(t):
                p2 = dict(params)
                p2["time"] = t
                return hfun(fv, mat, p2) if callable(hfun) else jnp.broadcast_to(
                    jnp.asarray(hfun), (nq,)
                )

            _, dhdt = _jax.jvp(h_of_t, (params["time"],), (jnp.ones((), params["time"].dtype),))
            contrib = contrib + jnp.einsum("q,qi->qi", dhdt, phi)
        return contrib[:, None, :]


TFMP_P, TFMP_S = "tfmp_pres", "tfmp_sat"


def _tfmp_common(fv, mat, params):
    nq = fv.x.shape[0]
    hfun = mat["gap"]
    h = hfun(fv, mat, params) if callable(hfun) else jnp.broadcast_to(
        jnp.asarray(hfun), (nq,))
    S = fv.val[TFMP_S][:, 0]
    gP = fv.grad[TFMP_P][:, 0, :]
    krl = mat.get("krl", lambda s: s**3)
    krg = mat.get("krg", lambda s: (1.0 - s) ** 3)
    return h, S, gP, krl(S), krg(S)


class TFMPMass(Equation):
    """Thin-film multiphase LIQUID conservation (reference R_TFMP_MASS rows
    of ``assemble_shell_tfmp``, src/mm_fill_shell.c:17422):

        h dS/dt + S dh/dt - div( h^3/(12 mu_l) Krl(S) grad P )
                 + U_avg . (S grad h + h grad S) + artificial D Krd grad S = 0

    Material keys: gap (h), mu_l, krl(S) (default S^3), D_tfmp (artificial
    molecular diffusion, the reference's load_molecular_diffusion_model;
    regularizes dR_S/dS where grad P vanishes), wall_velocity (average plate
    motion). Pair with ``TFMPOutflow`` on open boundaries — the IBP'd flux
    otherwise imposes zero liquid flux there."""

    def __init__(self, interp: str = "Q1", transient: bool = True,
                 supg: float = 0.0):
        super().__init__(TFMP_S, 1, interp)
        self.transient = transient
        self.supg = supg

    def residual(self, fv, mat, params):
        import jax as _jax

        nq = fv.x.shape[0]
        mu_l = prop(mat, "mu_l", fv, params)
        h, S, gP, Krl, _ = _tfmp_common(fv, mat, params)
        gS = fv.grad[TFMP_S][:, 0, :]
        phi = fv.phi[TFMP_S]
        gphi = fv.gphi[TFMP_S]

        mob = h**3 / (12.0 * mu_l) * Krl
        c = jnp.einsum("q,qk,qik->qi", mob, gP, gphi)
        D = mat.get("D_tfmp", 0.0)
        if D:
            c = c + D * jnp.einsum("qk,qik->qi", gS, gphi)
        U = mat.get("wall_velocity", None)
        if U is not None:
            Uv = U(fv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U), (nq, fv.x.shape[1]))
            hfun = mat["gap"]

            def h_of_x(x):
                import types
                fv2 = types.SimpleNamespace(**fv.__dict__)
                fv2.x = x
                return hfun(fv2, mat, params) if callable(hfun) else h

            gh = _jax.jacfwd(lambda xx: h_of_x(xx).sum())(fv.x) if callable(hfun) \
                else jnp.zeros_like(fv.x)
            adv = S * jnp.einsum("qk,qk->q", Uv, gh) \
                + h * jnp.einsum("qk,qk->q", Uv, gS)
            c = c + adv[:, None] * phi
        if self.transient:
            dhdt = _gap_dot(fv, mat, params, h)
            c = c + (h * fv.dot[TFMP_S][:, 0] + S * dhdt)[:, None] * phi
        if self.supg > 0:
            # streamline-upwind along the saturation characteristic
            # a = -(h^3/12 mu_l) Krl'(S) grad P (the reference feeds pg_data
            # upwinding into assemble_shell_tfmp); vanishes on uniform S
            krl = mat.get("krl", lambda s: s**3)
            dkrl = _jax.vmap(_jax.grad(krl))(S)
            a = -(h**3 / (12.0 * mu_l) * dkrl)[:, None] * gP
            a2 = jnp.sum(a * a, axis=1)
            tau = self.supg * fv.h_elem * jnp.sqrt(a2 + 1e-30) / (2 * a2 + 1e-12)
            adS = jnp.einsum("qk,qk->q", a, gS)
            c = c + tau[:, None] * adS[:, None] * jnp.einsum("qk,qik->qi", a, gphi)
        return c[:, None, :]


class TFMPBound(Equation):
    """Thin-film multiphase GAS conservation (reference R_TFMP_BOUND rows):

        d/dt( rho_g h (1-S) ) - div( rho_g h^3/(12 mu_g) Krg(S) grad P ) = 0

    ``rho_g``: constant or callable(P) for compressible gas (the reference's
    load_gas_density_model)."""

    def __init__(self, interp: str = "Q1", transient: bool = True):
        super().__init__(TFMP_P, 1, interp)
        self.transient = transient

    def residual(self, fv, mat, params):
        mu_g = prop(mat, "mu_g", fv, params)
        h, S, gP, _, Krg = _tfmp_common(fv, mat, params)
        P = fv.val[TFMP_P][:, 0]
        rg = mat.get("rho_g", 1.0)
        rho = rg(P) if callable(rg) else rg
        phi = fv.phi[TFMP_P]
        gphi = fv.gphi[TFMP_P]
        mob = rho * h**3 / (12.0 * mu_g) * Krg
        c = jnp.einsum("q,qk,qik->qi", mob, gP, gphi)
        if self.transient:
            Sdot = fv.dot[TFMP_S][:, 0]
            Pdot = fv.dot[TFMP_P][:, 0]
            if callable(rg):
                import jax as _jax

                drho = _jax.vmap(_jax.grad(rg))(P)
            else:
                drho = jnp.zeros_like(P)
            dhdt = _gap_dot(fv, mat, params, h)
            ddt = h * (-rho * Sdot + (1.0 - S) * drho * Pdot) \
                + rho * (1.0 - S) * dhdt
            c = c + ddt[:, None] * phi
        return c[:, None, :]


def _gap_dot(fv, mat, params, h):
    """dh/dt of the prescribed gap via AD in params["time"] (the squeeze
    terms of the reference TFMP/LUBP equations)."""
    import jax as _jax

    hfun = mat["gap"]
    if not callable(hfun):
        return jnp.zeros_like(h)

    def h_of_t(t):
        p2 = dict(params)
        p2["time"] = t
        return hfun(fv, mat, p2)

    t = params["time"]
    _, dhdt = _jax.jvp(h_of_t, (t,), (jnp.ones((), t.dtype),))
    return dhdt


class ReynoldsFilmPowerLaw(Equation):
    """Reynolds lubrication for a POWER-LAW fluid (capability of
    ``assemble_lubrication_power_law``, ``src/mm_fill_shell.c:14633`` +
    ``calculate_lub_q_v_nonnewtonian``). The reference solves auxiliary
    wall-shear-rate unknowns per point because its hand-coded Jacobians
    need them; with AD the closed-form pressure-driven channel flux for
    tau = m (du/dz)^n differentiates directly:

        q = -(2n/(2n+1)) (h/2)^((2n+1)/n) (|grad P|/m)^(1/n)
              * grad P / |grad P|  +  U_avg h

    (n = 1 recovers the Newtonian h^3/(12 m) mobility exactly), and the
    lubrication mass balance is div q + dh/dt = 0, tested weakly.

    Material keys: ``gap`` (h: constant or callable), ``m_lub``
    (consistency), ``n_exp`` (power-law index), ``wall_velocity``
    (average plate velocity U_avg, optional)."""

    def __init__(self, interp: str = "Q1", transient: bool = False,
                 eps_reg: float = 1e-12):
        super().__init__(LUB_VAR, 1, interp)
        self.transient = transient
        self.eps_reg = eps_reg

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        gp = fv.grad[LUB_VAR][:, 0, :]
        m = prop(mat, "m_lub", fv, params, 1.0)
        n = mat.get("n_exp", 1.0)
        hfun = mat["gap"]
        h = hfun(fv, mat, params) if callable(hfun) else \
            jnp.broadcast_to(jnp.asarray(hfun), (nq,))
        gphi = fv.gphi[LUB_VAR]
        phi = fv.phi[LUB_VAR]
        # |grad P| regularized so the 1/n-1 power is AD-safe at gp = 0
        gmag = jnp.sqrt(jnp.sum(gp * gp, axis=1) + self.eps_reg)
        coef = (2.0 * n / (2.0 * n + 1.0)) * (h / 2.0) ** ((2.0 * n + 1.0) / n)
        qmag_over_g = coef * (gmag / m) ** (1.0 / n) / gmag  # q = -this * gp
        # weak form: -q . grad(phi)
        contrib = jnp.einsum("q,qk,qik->qi", qmag_over_g, gp, gphi)
        U = mat.get("wall_velocity", None)
        if U is not None:
            Uv = U(fv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U), (nq, fv.x.shape[1]))
            contrib = contrib - jnp.einsum("qk,q,qik->qi", Uv, h, gphi)
        if self.transient:
            dhdt = _gap_dot(fv, mat, params, h)
            contrib = contrib + dhdt[:, None] * phi
        return contrib[:, None, :]


LUB_CURV = "lub_curv"  # SHELL_LUB_CURV


class LubricationCurvature(Equation):
    """SHELL_LUB_CURV rows (``assemble_lubrication_curvature``,
    ``src/mm_fill_shell.c:13772``): in-plane curvature of the level-set
    interface inside a lubrication gap, fed to the two-phase lubrication
    capillary pressure. Pseudo-relaxed projection of div(n_LS):

        R_i = (kappa + lambda dkappa/dt) w_i
              + lambda (v_avg . grad kappa) w_i
              + K_diff h_elem^2 grad(kappa) . grad(phi_i)
              + curvX * n_LS . grad(phi_i)

    with n_LS = grad(F)/|grad F| from the shell level-set field ``fill``,
    SUPG weighting w_i = phi_i + (v_avg/|v|h) . grad(phi_i) (supg = 1 in
    the reference), and interface modulation curvX (Lub_Curv_Modulation):
    1 inside |F| < alpha, ramping 2 - |F|/alpha to zero by 2 alpha.

    Material keys: ``curv_relax`` (lambda, default 0), ``curv_diff``
    (K_diff, default 0.2), ``ls_alpha`` (interface half-width; 0 disables
    modulation), ``lub_velocity`` (callable v_avg(fv, mat, params) ->
    (nq, dim), default 0)."""

    def __init__(self, interp: str = "Q1", transient: bool = False,
                 supg: float = 1.0, var: str = LUB_CURV,
                 fill_var: str = "fill"):
        # var/fill_var: pass ("lub_curv_2", "pf_2") for the reference's
        # phase-field-2 R_SHELL_LUB_CURV_2 variant
        # (assemble_lubrication_curvature_2, src/mm_fill.c:2070)
        super().__init__(var, 1, interp)
        self.transient = transient
        self.supg = supg
        self.fill_var = fill_var

    def residual(self, fv, mat, params):
        LUB_CURV = self.var
        nq = fv.x.shape[0]
        kap = fv.val[LUB_CURV][:, 0]
        gk = fv.grad[LUB_CURV][:, 0, :]
        phi = fv.phi[LUB_CURV]
        gphi = fv.gphi[LUB_CURV]
        F = fv.val[self.fill_var][:, 0]
        gF = fv.grad[self.fill_var][:, 0, :]
        nmag = jnp.sqrt(jnp.sum(gF * gF, axis=1))
        ninv = jnp.where(nmag > 0, 1.0 / jnp.maximum(nmag, 1e-30), 1.0)
        nls = gF * ninv[:, None]
        lam = mat.get("curv_relax", 0.0)
        Kd = mat.get("curv_diff", 0.2)
        alpha = mat.get("ls_alpha", 0.0)
        vfun = mat.get("lub_velocity", None)
        wt = phi
        if vfun is not None:
            v = vfun(fv, mat, params)
            if self.supg > 0:
                v2 = jnp.sum(v * v, axis=1)
                hinv = jnp.where(v2 > 0,
                                 fv.h_elem / (2.0 * jnp.sqrt(v2 + 1e-30)), 0.0)
                wt = phi + self.supg * hinv[:, None] * \
                    jnp.einsum("qk,qik->qi", v, gphi)
        c = kap[:, None] * wt
        if lam:
            if self.transient:
                c = c + lam * fv.dot[LUB_CURV][:, 0][:, None] * wt
            if vfun is not None:
                adv = jnp.einsum("qk,qk->q", v, gk)
                c = c + lam * adv[:, None] * wt
        if Kd:
            c = c + jnp.einsum("q,qk,qik->qi", Kd * fv.h_elem ** 2, gk, gphi)
        if alpha:
            aF = jnp.abs(F)
            curvX = jnp.where(aF < alpha, 1.0,
                              jnp.where(aF < 2.0 * alpha,
                                        2.0 - aF / alpha, 0.0))
        else:
            curvX = jnp.ones_like(F)
        c = c + curvX[:, None] * jnp.einsum("qk,qik->qi", nls, gphi)
        return c[:, None, :]


def tie_lub_film(problem, junction_nodeset, lub_var: str = LUB_VAR,
                 film_var: str = "film_pressure", flux_sign: float = 1.0):
    """LUBP_SH_FP_MATCH + LUBP_SH_FP_FLUX: couple a confined-lubrication
    (LUBP) shell region to a free-film (SHELL_FILMP) region at their
    junction node(s).

    Reference: ``src/mm_shell_bc.c:1667 match_lubrication_film_pressure``
    (pressure continuity, strong row on R_LUBP) and ``:1743
    put_lub_flux_in_film`` (the lubrication row moved into the film row =
    flux continuity). Here the same two operations are expressed as a
    row-inject plus a multi-variable point constraint. ``flux_sign`` is the
    factor on the injected row: +1 matches flux continuity in THIS
    framework's weak-form sign conventions (ReynoldsFilm tests +grad(phi)
    mob grad(p); FilmPressure tests -q . grad(phi) — the reference's -1
    reflects its opposite filmp row sign)."""
    problem.add_row_inject(junction_nodeset, lub_var, film_var,
                           sign=flux_sign)
    problem.add_point_constraint(junction_nodeset, [lub_var, film_var], 0,
                                 lambda q, X0, params: q[0] - q[1])


class LubEndKinematic(FaceKernel):
    """VELO_NORMAL_LUB / LUB_KINEMATIC (``src/mm_ns_bc.c:587
    fvelo_normal_lub_bc``, dispatched for both cards in ``src/bc_integ.c:524``):
    at a lubrication-shell endpoint meeting the bulk, tie the bulk normal
    motion to the gap-integrated end flux:

        v . n_end = (lubflux + (q - H xdot) . n_end) / H,
        q = -H^3/(12 mu) grad_s p + U H/2

    i.e. the bulk boundary velocity (VELO_NORMAL_LUB, var="velocity") or
    mesh velocity (LUB_KINEMATIC, var=mesh displacement) equals the film's
    mean end velocity. The reference applies its func = lubflux +
    (q - H xdot).n STRONGLY on the rotated normal row (row replacement);
    as a penalty kernel the same constraint needs the explicit v.n term to
    couple the row to its own variable (a pure penalty on a v-free func is
    absorbed by the momentum stiffness). Apply on a shell-endpoint sideset
    (``goma_tpu.bc.shell_end.shell_end_sidesets``); register
    ``PassiveVar(var, dim, interp)`` on the shell block so the bulk rows
    are reachable. Material keys as in :class:`ReynoldsFilm`."""

    def __init__(self, dim: int, var: str = "velocity", lubflux=0.0,
                 penalty: float = 1e6, lub_var: str = LUB_VAR):
        super().__init__(var, dim)
        self.dim = dim
        self.lubflux = lubflux
        self.penalty = penalty
        self.lub_var = lub_var

    def residual(self, sfv, mat, params):
        from goma_tpu.fem.fields import MESH_VAR

        nq = sfv.x.shape[0]
        mu = prop(mat, "mu_lub", sfv, params, 1.0)
        hfun = mat["gap"]
        h = hfun(sfv, mat, params) if callable(hfun) else jnp.broadcast_to(
            jnp.asarray(hfun, dtype=sfv.x.dtype), (nq,))
        gp = sfv.grad[self.lub_var][:, 0, :]
        q = -(h ** 3 / (12.0 * mu))[:, None] * gp
        U = mat.get("wall_velocity", None)
        if U is not None:
            Uv = U(sfv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U, dtype=sfv.x.dtype), (nq, self.dim))
            q = q + 0.5 * h[:, None] * Uv
        if MESH_VAR in sfv.dot:
            q = q - h[:, None] * sfv.dot[MESH_VAR]
        lf = self.lubflux(sfv, mat, params) if callable(self.lubflux) \
            else self.lubflux
        n = sfv.normal  # endpoint conormal (psign path)
        vn = jnp.einsum("qk,qk->q", sfv.val[self.var], n)
        s = vn - (lf + jnp.einsum("qk,qk->q", q, n)) / h
        phi = sfv.phi[self.var]
        return self.penalty * jnp.einsum("q,qa,qi->qai", s, n, phi)


class TFMPFreeFlux(FaceKernel):
    """SHELL_TFMP_FREE_LIQ / SHELL_TFMP_FREE_GAS / SHELL_LUBRICATION_OUTFLOW
    (``src/mm_shell_bc.c`` ``shell_n_dot_liq_velo_bc_tfmp`` /
    ``shell_n_dot_gas_velo_bc_tfmp:`` / ``shell_lubrication_outflow:2757``):
    open-boundary closure at a thin-film-multiphase end — re-add the
    integrated-by-parts in-plane flux so the end stops imposing zero
    phase flux:

        liquid rows (tfmp_sat):  - phi (h^3/(12 mu_l)) Krl (grad P . n)
        gas rows (tfmp_pres):    - phi rho_g (h^3/(12 mu_g)) Krg (grad P . n)

    Material keys as in :class:`TFMPMass`/:class:`TFMPBound`."""

    def __init__(self, phase: str = "liquid"):
        assert phase in ("liquid", "gas")
        super().__init__(TFMP_S if phase == "liquid" else TFMP_P, 1)
        self.phase = phase

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        hfun = mat["gap"]
        h = hfun(sfv, mat, params) if callable(hfun) else jnp.broadcast_to(
            jnp.asarray(hfun, dtype=sfv.x.dtype), (nq,))
        S = sfv.val[TFMP_S][:, 0]
        gP = sfv.grad[TFMP_P][:, 0, :]
        gPn = jnp.einsum("qk,qk->q", gP, sfv.normal)
        if self.phase == "liquid":
            mu_l = prop(mat, "mu_l", sfv, params)
            krl = mat.get("krl", lambda s: s**3)
            q = -(h**3 / (12.0 * mu_l)) * krl(S) * gPn
        else:
            mu_g = prop(mat, "mu_g", sfv, params)
            krg = mat.get("krg", lambda s: (1.0 - s) ** 3)
            P = sfv.val[TFMP_P][:, 0]
            rg = mat.get("rho_g", 1.0)
            rho = rg(P) if callable(rg) else rg
            q = -rho * (h**3 / (12.0 * mu_g)) * krg(S) * gPn
        phi = sfv.phi[self.var]
        return (q[:, None] * phi)[:, None, :]


class ShellFlowDeveloped(FaceKernel):
    """SHELL_FLOW_DEVELOPED (``src/mm_shell_bc.c`` ``shell_n_dot_gradp_bc``,
    dispatched src/bc_integ.c:1068): fully-developed film end — the
    collocated condition n . grad(P) = 0 on the film-pressure rows,
    applied as a penalty at the shell endpoint."""

    def __init__(self, var: str = "film_pressure", penalty: float = 1e6):
        super().__init__(var, 1)
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        gP = sfv.grad[self.var][:, 0, :]
        s = jnp.einsum("qk,qk->q", gP, sfv.normal)
        phi = sfv.phi[self.var]
        return self.penalty * (s[:, None] * phi)[:, None, :]


class ShellLubWall(FaceKernel):
    """SHELL_LUB_WALL (``src/mm_shell_bc.c:499 shell_n_dot_flow_wall``):
    extra flow resistance from a bounding side wall of the lubrication
    domain — the lubrication flux component along the wall tangent,
    scaled by the power-law wall factor

        W = -pi (2 + 1/n) / (3 + 1/n) / 2^(2 + 1/n) * fudge,

    loads the lub-pressure rows weakly:  W * (q . t_wall) phi_i  with
    q = -h^3/(12 mu) grad p + U h/2 (``calculate_lub_q_v``). When a
    level-set field is present the factor is gated by (1 - H(F)) exactly
    like the reference. Applied with the proper arc measure (the
    reference's 1/sdet cancels its own wt*sdet quadrature weight).
    Material keys as in :class:`ReynoldsFilm` (+ ``ls_alpha`` for the
    gate width when ``fill`` is gathered)."""

    def __init__(self, pwr_index: float = 1.0, fudge: float = 1.0,
                 lub_var: str = LUB_VAR, fill_var: str = "fill"):
        super().__init__(lub_var, 1)
        self.n_pwr = pwr_index
        self.fudge = fudge
        self.fill_var = fill_var

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        mu = prop(mat, "mu_lub", sfv, params, 1.0)
        hfun = mat["gap"]
        h = hfun(sfv, mat, params) if callable(hfun) else jnp.broadcast_to(
            jnp.asarray(hfun, dtype=sfv.x.dtype), (nq,))
        gp = sfv.grad[self.var][:, 0, :]
        q = -(h ** 3 / (12.0 * mu))[:, None] * gp
        U = mat.get("wall_velocity", None)
        if U is not None:
            Uv = U(sfv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U, dtype=sfv.x.dtype), (nq, sfv.x.shape[1]))
            q = q + 0.5 * h[:, None] * Uv
        n = self.n_pwr
        W = -jnp.pi * (2.0 + 1.0 / n) / (3.0 + 1.0 / n) \
            / 2.0 ** (2.0 + 1.0 / n) * self.fudge
        if self.fill_var in sfv.val:
            from goma_tpu.physics.level_set import heaviside

            eps = mat.get("ls_alpha", params.get("ls_eps", 0.1))
            H = heaviside(sfv.val[self.fill_var][:, 0], eps)
            W = W * (1.0 - H)
        t = sfv.tangents[:, :, 0]
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        s = W * jnp.einsum("qk,qk->q", q, t)
        phi = sfv.phi[self.var]
        return (s[:, None] * phi)[:, None, :]


class TFMPAvgPlateVelo(FaceKernel):
    """SHELL_TFMP_AVG_PLATE_VELO (``src/mm_shell_bc.c:2221
    shell_tfmp_avg_plate_velo_liq``): open boundary of a thin-film
    multiphase gap between translating plates — the liquid carried by the
    average plate velocity leaves through the side:

        func = h S (n . v_avg),   v_avg = (veloU + veloL)/2

    weak on the saturation (liquid mass) rows. ``v_avg``: explicit average
    plate velocity; defaults to material key ``wall_velocity`` (already
    the plate *average* in this framework's TFMP closures)."""

    def __init__(self, v_avg=None):
        super().__init__(TFMP_S, 1)
        self.v_avg = v_avg

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        dim = sfv.x.shape[1]
        hfun = mat["gap"]
        h = hfun(sfv, mat, params) if callable(hfun) else jnp.broadcast_to(
            jnp.asarray(hfun, dtype=sfv.x.dtype), (nq,))
        S = sfv.val[TFMP_S][:, 0]
        v = self.v_avg if self.v_avg is not None else \
            mat.get("wall_velocity", None)
        if v is None:
            v = jnp.zeros((nq, dim), dtype=sfv.x.dtype)
        elif callable(v):
            v = v(sfv, mat, params)
        else:
            v = jnp.broadcast_to(jnp.asarray(v, dtype=sfv.x.dtype),
                                 (nq, dim))
        vn = jnp.einsum("qk,qk->q", v, sfv.normal)
        phi = sfv.phi[TFMP_S]
        return ((h * S * vn)[:, None] * phi)[:, None, :]
