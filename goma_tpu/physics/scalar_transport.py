"""Energy and species transport equations.

Parity: ``src/mm_fill_energy.c:107 assemble_energy`` (with conductivity /
heat-capacity / source closures) and ``src/mm_fill_species.c:191
assemble_mass_transport`` (Fickian flux model; Stefan-Maxwell et al. later).

Weak forms:
  energy:  int phi rho Cp (Tdot + u.grad T) + grad phi . (k grad T) - phi H
  species: int phi (cdot_w + u.grad c_w) + grad phi . (D_w grad c_w) - phi S_w
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation, InterfaceKernel
from goma_tpu.physics.materials import prop
from goma_tpu.physics.fluid import _as_nq, advective_velocity


class Energy(Equation):
    def __init__(self, interp: str = "Q2", transient: bool = True, convection: bool = True):
        super().__init__("temperature", 1, interp)
        self.transient = transient
        self.convection = convection

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        T = fv.val["temperature"][:, 0]
        gT = fv.grad["temperature"][:, 0, :]  # (nq, dim)
        rho = _as_nq(prop(mat, "rho", fv, params, 1.0), nq)
        Cp = _as_nq(prop(mat, "Cp", fv, params, 1.0), nq)
        k = _as_nq(prop(mat, "k", fv, params, 1.0), nq)

        adv = jnp.zeros(nq)
        if self.transient:
            adv = adv + fv.dot["temperature"][:, 0]
        if self.convection and "velocity" in fv.val:
            adv = adv + jnp.einsum("qk,qk->q", advective_velocity(fv), gT)
        phi = fv.phi["temperature"]
        gphi = fv.gphi["temperature"]
        contrib = jnp.einsum("q,qi->qi", rho * Cp * adv, phi)
        contrib = contrib + jnp.einsum("q,qk,qik->qi", k, gT, gphi)
        H = mat.get("heat_source", None)
        if H is not None:
            Hval = _as_nq(H(fv, mat, params) if callable(H) else H, nq)
            contrib = contrib - jnp.einsum("q,qi->qi", Hval, phi)
        return contrib[:, None, :]


class Species(Equation):
    """Multicomponent Fickian species transport (n_species components)."""

    def __init__(self, n_species: int, interp: str = "Q2", transient: bool = True, convection: bool = True):
        super().__init__("species", n_species, interp)
        self.n_species = n_species
        self.transient = transient
        self.convection = convection

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        c = fv.val["species"]  # (nq, ns)
        gc = fv.grad["species"]  # (nq, ns, dim)
        D = prop(mat, "diffusivity", fv, params, 1.0)
        D = jnp.asarray(D)
        if D.ndim == 0:
            D = jnp.broadcast_to(D, (self.n_species,))
        adv = jnp.zeros((nq, self.n_species))
        if self.transient:
            adv = adv + fv.dot["species"]
        if self.convection and "velocity" in fv.val:
            adv = adv + jnp.einsum("qk,qwk->qw", advective_velocity(fv), gc)
        phi = fv.phi["species"]
        gphi = fv.gphi["species"]
        contrib = jnp.einsum("qw,qi->qwi", adv, phi)
        contrib = contrib + jnp.einsum("w,qwk,qik->qwi", D, gc, gphi)
        # electromigration (FICKIAN_CHARGED, reference src/mm_fill_species.c
        # charged-species flux): J_w += -z_w u_w F c_w grad(V); weak
        # + z u F c grad(V) . grad(phi). Material keys: charge (ns,) valences
        # and mobility (ns,) [mol s/kg]; couples to the "voltage" variable.
        z = mat.get("charge", None)
        if z is not None and "voltage" in fv.val:
            from goma_tpu.physics.electro import FARADAY

            z = jnp.broadcast_to(jnp.asarray(z, dtype=c.dtype),
                                 (self.n_species,))
            um = jnp.broadcast_to(jnp.asarray(mat["mobility"], dtype=c.dtype),
                                  (self.n_species,))
            gV = fv.grad["voltage"][:, 0, :]  # (nq, dim)
            contrib = contrib + FARADAY * jnp.einsum(
                "w,w,qw,qk,qik->qwi", z, um, c, gV, gphi)
        S = mat.get("species_source", None)
        if S is not None:
            Sval = S(fv, mat, params) if callable(S) else jnp.broadcast_to(
                jnp.asarray(S), (nq, self.n_species)
            )
            contrib = contrib - jnp.einsum("qw,qi->qwi", Sval, phi)
        return contrib


class ResidenceTime(Equation):
    """RESTIME (reference ``assemble_poynting`` residence-time branch,
    ``src/mm_fill_terms.c``, eqn R_RESTIME): residence-time transport

        tau_dot + u . grad(tau) - div(D grad tau) = 1

    so tau accumulates 1 unit per unit time along pathlines — the field
    whose boundary-to-point value is the fluid's residence time.
    SUPG-stabilized for the advection-dominated (D -> 0) limit."""

    def __init__(self, interp: str = "Q1", D: float = 0.0,
                 supg: float = 0.5, transient: bool = False):
        super().__init__("restime", 1, interp)
        self.D = D
        self.supg = supg
        self.transient = transient

    def residual(self, fv, mat, params):
        from goma_tpu.physics.fluid import advective_velocity

        g = fv.grad["restime"][:, 0, :]
        u = advective_velocity(fv)
        r = jnp.einsum("qk,qk->q", u, g) - 1.0
        if self.transient:
            r = r + fv.dot["restime"][:, 0]
        phi = fv.phi["restime"]
        gphi = fv.gphi["restime"]
        if self.supg > 0:
            u2 = jnp.sum(u * u, axis=1)
            tau = self.supg * fv.h_elem * jnp.sqrt(u2 + 1e-30) / (
                2.0 * u2 + 1e-12)
            w = phi + tau[:, None] * jnp.einsum("qk,qik->qi", u, gphi)
        else:
            w = phi
        contrib = jnp.einsum("q,qi->qi", r, w)
        if self.D:
            contrib = contrib + self.D * jnp.einsum("qk,qik->qi", g, gphi)
        return contrib[:, None, :]


class LightIntensity(Equation):
    """LIGHTP / LIGHTM / LIGHTD (reference ``assemble_poynting`` light
    branches, eqns R_LIGHT_INTP/INTM/INTD): Beer-Lambert directional
    light-intensity absorption

        s . grad(I) + beta I = 0

    with propagation direction s (+dir for the forward P wave, -dir for
    the backward M wave, the D diffuse field solved with its own beta).
    Exact 1D solution I = I0 exp(-beta s.x) (SUPG-stabilized first-order
    transport)."""

    def __init__(self, direction, beta: float, var: str = "light_intp",
                 interp: str = "Q1", supg: float = 0.5):
        super().__init__(var, 1, interp)
        import numpy as _np
        d = _np.asarray(direction, dtype=float)
        self.direction = d / _np.linalg.norm(d)
        self.beta = beta
        self.supg = supg

    def residual(self, fv, mat, params):
        g = fv.grad[self.var][:, 0, :]
        I = fv.val[self.var][:, 0]
        s = jnp.asarray(self.direction, dtype=fv.x.dtype)[: fv.x.shape[1]]
        r = jnp.einsum("qk,k->q", g, s) + self.beta * I
        phi = fv.phi[self.var]
        gphi = fv.gphi[self.var]
        if self.supg > 0:
            tau = self.supg * fv.h_elem / 2.0
            w = phi + tau[:, None] * jnp.einsum("qik,k->qi", gphi, s)
        else:
            w = phi
        return jnp.einsum("q,qi->qi", r, w)[:, None, :]


class BondEvolution(Equation):
    """Thixotropic bond-structure evolution R_BOND_EVOLUTION (reference
    ``assemble_bond_evolution``, ``src/mm_std_models.c:5929``; Mujumdar et
    al., J. Non-Newt. Fluid Mech. 102, 2002):

        nn_t + u.grad(nn) = -k1 nn gd^a + k2 (n0 - nn) gd^b  (+ D diffusion)

    with gd the shear-rate invariant. Homogeneous steady state:
    nn_eq = k2 gd^b n0 / (k1 gd^a + k2 gd^b). Pair with
    :class:`~goma_tpu.physics.materials.BondViscosity` for the
    structure-dependent viscosity (reference ``bond_viscosity``,
    ``src/mm_viscosity.c:2770``). NN_BC = Dirichlet on this variable."""

    def __init__(self, k1: float, k2: float, n0: float, aexp: float = 1.0,
                 bexp: float = 1.0, diff: float = 0.0,
                 transient: bool = True, interp: str = "Q1",
                 var: str = "bond"):
        super().__init__(var, 1, interp)
        self.k1, self.k2, self.n0 = k1, k2, n0
        self.aexp, self.bexp, self.diff = aexp, bexp, diff
        self.transient = transient

    def residual(self, fv, mat, params):
        from goma_tpu.physics.materials import shear_rate

        nn = fv.val[self.var][:, 0]
        gnn = fv.grad[self.var][:, 0, :]
        gd = shear_rate(fv) + 1e-14  # reference offset = DBL_SMALL
        nn_pos = jnp.maximum(nn, 0.0)  # reference clips negative structure
        r = self.k1 * nn_pos * gd ** self.aexp \
            - self.k2 * (self.n0 - nn_pos) * gd ** self.bexp
        if self.transient:
            r = r + fv.dot[self.var][:, 0]
        if "velocity" in fv.val:
            r = r + jnp.einsum("qk,qk->q", advective_velocity(fv), gnn)
        phi = fv.phi[self.var]
        out = r[:, None] * phi
        if self.diff:
            out = out + self.diff * jnp.einsum(
                "qk,qik->qi", gnn, fv.gphi[self.var])
        return out[:, None, :]


class ShearRateProjection(Equation):
    """R_SHEAR_RATE rows (the reference's projected shear-rate auxiliary
    variable, ``include/rf_fem_const.h`` SHEAR_RATE; assembled in
    ``src/mm_fill_terms.c`` as a projection): gd = sqrt(2 D:D) as a solved
    nodal field for closures that need a continuous shear rate (SH
    Dirichlet cards, suspension flux models):

        R_i = int phi_i (gd - gammadot(u))
    """

    def __init__(self, interp: str = "Q1", var: str = "shear_rate_proj"):
        super().__init__(var, 1, interp)

    def residual(self, fv, mat, params):
        from goma_tpu.physics.materials import shear_rate

        gd = fv.val[self.var][:, 0]
        phi = fv.phi[self.var]
        return ((gd - shear_rate(fv))[:, None] * phi)[:, None, :]


class LightFresnelJump(InterfaceKernel):
    """LIGHTP_JUMP / LIGHTM_JUMP (+_2) (``src/mm_ns_bc.c:15932
    qside_light_jump``): Fresnel intensity jump at an internal
    refractive-index interface, normal incidence (the reference hardwires
    mucos = 1):

        R = ((n - n_o)/(n + n_o))^2,   Y = (n_o/n)^2 (1 - R)
        I_f(downstream) - R I_b(downstream) - Y I_f(upstream) = 0

    applied as a penalty on the downstream block's ``var`` rows (side A of
    the interface pairs; the reference's strong two-sided assembly).
    ``var``: "light_intp" forward (LIGHTP_JUMP) or "light_intm" backward
    (LIGHTM_JUMP); ``other_var`` the opposite direction (its reflection
    contribution is dropped when not registered). Material key
    ``refindex`` on both blocks."""

    def __init__(self, var: str = "light_intp", other_var: str = "light_intm",
                 penalty: float = 1e6):
        super().__init__(var, 1)
        self.other_var = other_var
        self.penalty = penalty

    def residual(self, sa, sb, mat_a, mat_b, params):
        n = mat_a["refindex"]
        no = mat_b["refindex"]
        R = ((n - no) / (n + no)) ** 2
        Y = (no / n) ** 2 * (1.0 - R)
        If_a = sa.val[self.var][:, 0]
        If_b = sb.val[self.var][:, 0]
        Ib_a = sa.val[self.other_var][:, 0] if self.other_var in sa.val \
            else 0.0
        s = If_a - R * Ib_a - Y * If_b
        ca = self.penalty * (s[:, None] * sa.phi[self.var])[:, None, :]
        cb = jnp.zeros((s.shape[0], 1, sb.phi[self.var].shape[1]))
        return ca, cb
