"""Electro-potential / electrochemistry.

Parity: reference ``src/mm_fill_potential.c`` (``assemble_potential:124``,
Butler-Volmer surface currents :966-1255) and the surface-kinetics fluxes in
``src/mm_fill_species.c`` (Butler-Volmer :2075, HOR :2134, ORR :2195).

Potential equation (electroneutral conductor): div(kappa grad V) = 0, with
Butler-Volmer electrode kinetics as an integrated boundary flux.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation, FaceKernel
from goma_tpu.physics.materials import prop

POT_VAR = "voltage"
FARADAY = 96485.33212  # C/mol
GAS_R = 8.314462618


class Potential(Equation):
    """div(kappa grad V) + source = 0. Material key: ``kappa``."""

    def __init__(self, interp: str = "Q1"):
        super().__init__(POT_VAR, 1, interp)

    def residual(self, fv, mat, params):
        gV = fv.grad[POT_VAR][:, 0, :]
        kappa = prop(mat, "kappa", fv, params, 1.0)
        gphi = fv.gphi[POT_VAR]
        contrib = jnp.einsum("qk,qik->qi", (kappa if jnp.ndim(kappa) == 0 else kappa[:, None]) * gV, gphi)
        src = mat.get("current_source", None)
        if src is not None:
            s = src(fv, mat, params) if callable(src) else src
            contrib = contrib - jnp.einsum("q,qi->qi", jnp.broadcast_to(jnp.asarray(s), gV.shape[:1]), fv.phi[POT_VAR])
        return contrib[:, None, :]


class ButlerVolmerBC(FaceKernel):
    """Electrode kinetics: normal current density
        i = i0 [exp(aa F eta / RT) - exp(-ac F eta / RT)],  eta = V_metal - V
    applied as a weak flux on the potential equation.
    Reference: BUTLER_VOLMER BCs (src/mm_fill_potential.c:966).
    """

    def __init__(self, i0: float, alpha_a: float, alpha_c: float, V_metal: float,
                 T: float = 298.15):
        super().__init__(POT_VAR, 1)
        self.i0, self.aa, self.ac = i0, alpha_a, alpha_c
        self.V_metal, self.T = V_metal, T

    def residual(self, sfv, mat, params):
        V = sfv.val[POT_VAR][:, 0]
        eta = self.V_metal - V
        f = FARADAY / (GAS_R * self.T)
        i = self.i0 * (jnp.exp(self.aa * f * eta) - jnp.exp(-self.ac * f * eta))
        phi = sfv.phi[POT_VAR]
        # current entering the electrolyte = -flux of kappa grad V . n
        return -jnp.einsum("q,qi->qi", i, phi)[:, None, :]


class HORFlux(FaceKernel):
    """Hydrogen-oxidation (linearized Butler-Volmer) surface species flux
    (reference ``mass_flux_surf_HOR``, src/mm_fill_species.c:2134):

        q = (ai0 H / (n R T)) (c/cref)^beta (alpha_a + alpha_c)(V - Phi - U0)

    applied as + int phi q on the species equation; Phi is the electrolyte
    potential variable when present (else 0)."""

    def __init__(self, ai0: float, H: float, n: float, alpha_a: float,
                 alpha_c: float, U0: float, beta: float, cref: float,
                 V: float, T: float = 298.15, comp: int = 0,
                 var: str = "species", ncomp: int = 1):
        super().__init__(var, ncomp)
        self.k = ai0 * H / (n * GAS_R * T)
        self.ac_sum = alpha_a + alpha_c
        self.U0, self.beta, self.cref, self.V = U0, beta, cref, V
        self.comp = comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        c = sfv.val[self.var][:, self.comp]
        Phi = sfv.val[POT_VAR][:, 0] if POT_VAR in sfv.val else 0.0
        q = self.k * (jnp.maximum(c, 1e-30) / self.cref) ** self.beta \
            * self.ac_sum * (self.V - Phi - self.U0)
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(q[:, None] * phi)


class ORRFlux(FaceKernel):
    """Oxygen-reduction (cathodic Tafel) surface species flux (reference
    ``mass_flux_surf_ORR``, src/mm_fill_species.c:2195):

        q = (ai0 H / (n F)) (c/cref)^beta exp(-alpha_c F (V - Phi - U0)/(R T))
    """

    def __init__(self, ai0: float, H: float, n: float, alpha_c: float,
                 U0: float, beta: float, cref: float, V: float,
                 T: float = 298.15, comp: int = 0, var: str = "species",
                 ncomp: int = 1):
        super().__init__(var, ncomp)
        self.k = ai0 * H / (n * FARADAY)
        self.f = alpha_c * FARADAY / (GAS_R * T)
        self.U0, self.beta, self.cref, self.V = U0, beta, cref, V
        self.comp = comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        c = sfv.val[self.var][:, self.comp]
        Phi = sfv.val[POT_VAR][:, 0] if POT_VAR in sfv.val else 0.0
        q = self.k * (jnp.maximum(c, 1e-30) / self.cref) ** self.beta \
            * jnp.exp(-self.f * (self.V - Phi - self.U0))
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(q[:, None] * phi)


class NickelPlatingFlux(FaceKernel):
    """YFLUX_NI / CURRENT_NI (``src/mm_fill_species.c:2652
    mass_flux_surf_NI``, wrappers ``:5315``/``:5573``): the fitted
    four-reaction nickel-electroplating surface kinetics

        H+    + e-  -> H2/2        (alpha_c 0.11, i00 0.289,    U00  0)
        H2O   + e-  -> H2/2 + OH-  (alpha_c 0.4,  i00 8.80e-9,  U00 -0.8280)
        NiOH+ + 2e- -> Ni + OH-    (alpha_c 0.33, i00 1.34,     U00 -0.3648)
        Ni2+  + 2e- -> Ni          (alpha_c 0.21, i00 1.07e-5,  U00 -0.2363)

    with Q_r = (i00/nF) [grpc * (c x)/0.001 - grpa * ...] exactly as coded
    in the reference (including its one-sided/two-sided branches and
    electron-count weights). ``mode``: a species index in the reference
    layout (0=Ni2+, 2=H+, 3=OH-, 4=NiOH+, 6=H2) applies that species' net
    outward flux on its rows; ``mode="current"`` applies the total molar
    current sum on the potential rows (the CURRENT_NI card). The total
    molar concentration c enters via ``c_total`` (constant or
    callable(sfv, mat, params) -> (nq,); the reference computes rho/M_mix
    from the density closure). Convective flux terms vanish on fixed
    no-penetration electrodes and are omitted."""

    F = 96487.0
    GAS_R = 8.314

    def __init__(self, mode, PHI_E: float, T: float, c_total=1.0,
                 idx=(0, 2, 3, 4), var: str = "species", ncomp: int = 1):
        if mode == "current":
            super().__init__(POT_VAR, 1)
        else:
            super().__init__(var, ncomp)
        self.mode = mode
        self.PHI_E = PHI_E
        self.T = T
        self.c_total = c_total
        self.i_ni, self.i_h, self.i_oh, self.i_nioh = idx
        self.species_var = var

    def _fluxes(self, sfv, mat, params):
        FRT = self.F / (self.GAS_R * self.T)
        Phi = sfv.val[POT_VAR][:, 0] if POT_VAR in sfv.val else 0.0
        ct = self.c_total(sfv, mat, params) if callable(self.c_total) \
            else self.c_total
        x = sfv.val[self.species_var]
        dphi = lambda n, U00: n * FRT * (self.PHI_E - Phi - U00)
        out = {}
        # H+ + e- -> H2/2
        d = dphi(1, 0.0)
        Q1 = (0.289 / (1 * self.F)) * jnp.exp(-0.11 * d) \
            * ct * x[:, self.i_h] / 0.001
        # H2O + e- -> H2/2 + OH-
        d = dphi(1, -0.8280)
        Q2 = (8.80e-09 / (1 * self.F)) * jnp.exp(-0.4 * d)
        # NiOH+ + 2e- -> Ni + OH-
        d = dphi(2, -0.3648)
        Q3 = (1.34 / (2 * self.F)) * (ct / 0.001) * (
            jnp.exp(-0.33 * d) * x[:, self.i_nioh]
            - jnp.exp(0.67 * d) * x[:, self.i_oh])
        # Ni2+ + 2e- -> Ni
        d = dphi(2, -0.2363)
        Q4 = (1.07e-05 / (2 * self.F)) * (
            jnp.exp(-0.21 * d) * ct * x[:, self.i_ni] / 0.001
            - jnp.exp(0.79 * d))
        out[self.i_h] = Q1
        out[self.i_oh] = -Q2 - Q3
        out[self.i_nioh] = Q3
        out[self.i_ni] = Q4
        out["current"] = Q1 + Q2 + 2.0 * Q3 + 2.0 * Q4
        return out

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        fl = self._fluxes(sfv, mat, params)
        phi = sfv.phi[self.var]
        if self.mode == "current":
            q = fl["current"]
            return (q[:, None] * phi)[:, None, :]
        q = fl[self.mode]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.mode, :].set(q[:, None] * phi)


class AlloyEvapFlux(FaceKernel):
    """YFLUX_ALLOY (``src/mm_fill_species.c:4280 mass_flux_alloy_surf``):
    metal-evaporation mass flux with a cubic-in-temperature transfer
    coefficient,

        n.j = exp[c0 + c1 dT - c2 dT^2 + c3 dT^3] (y - y_inf),  dT = T - Tm
    """

    def __init__(self, Tm: float, c0: float, c1: float, c2: float,
                 c3: float, y_inf: float, comp: int = 0,
                 var: str = "species", ncomp: int = 1):
        super().__init__(var, ncomp)
        self.Tm, self.c = Tm, (c0, c1, c2, c3)
        self.y_inf, self.comp = y_inf, comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        T = sfv.val["temperature"][:, 0]
        dT = T - self.Tm
        c0, c1, c2, c3 = self.c
        k = jnp.exp(c0 + c1 * dT - c2 * dT**2 + c3 * dT**3)
        y = sfv.val[self.var][:, self.comp]
        q = k * (y - self.y_inf)
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, self.comp, :].set(q[:, None] * phi)


class CurrentSIC(FaceKernel):
    """CURRENT_SIC / CURRENT_USER_SIC (``src/mm_fill_potential.c:1702
    apply_potential_grad_bc``, dispatched src/bc_integ.c:1762): strongly
    pin the boundary current density of the potential equation,

        i_applied + perm (grad V . n) = 0

    (perm: the card's conductivity/permittivity coefficient). ``i_app`` is
    a constant or callable(sfv, mat, params) -> (nq,) — the USER variant.
    Applied as a penalty on the voltage rows (the reference replaces the
    strong-integrated row)."""

    def __init__(self, i_app, perm: float = None, penalty: float = 1e6):
        super().__init__(POT_VAR, 1)
        self.i_app = i_app
        self.perm = perm
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        perm = self.perm if self.perm is not None else \
            prop(mat, "permittivity", sfv, params, 1.0)
        gV = sfv.grad[POT_VAR][:, 0, :]
        ia = self.i_app(sfv, mat, params) if callable(self.i_app) \
            else jnp.broadcast_to(jnp.asarray(self.i_app, dtype=sfv.x.dtype),
                                  (nq,))
        s = ia + perm * jnp.einsum("qk,qk->q", gV, sfv.normal)
        phi = sfv.phi[POT_VAR]
        return self.penalty * (s[:, None] * phi)[:, None, :]


def surface_charge_constraint(charges, sigma: float, replace_comp: int):
    """SURFACE_CHARGE (``src/mm_fill_potential.c:917 surface_charge_surf``):
    the strong boundary constraint sum_i z_i c_i = sigma on the species
    (electroneutral surface when sigma = 0). Use with
    ``Problem.add_point_constraint(nodeset, "species", replace_comp, g)``.
    """
    z = jnp.asarray(charges, dtype=float)

    def g(q, X0, params):
        return jnp.dot(z, q[: z.shape[0]]) - sigma

    return g


def electrodeposition_velocity(PHI_E: float, T: float, Vmolar: float,
                               c_total=1.0, idx=(0, 2, 3, 4),
                               var: str = "species"):
    """KIN_ELECTRODEPOSITION / VNORM_ELECTRODEPOSITION
    (``src/mm_fill_species.c:8029/8243``): interface recession/normal
    velocity from the deposition flux, v_n = Vmolar * Q_dep with Q_dep the
    nickel-plating deposit rate (Ni + NiOH reactions). Use as the ``leak``
    of :class:`goma_tpu.bc.KinematicBC` (mesh kinematics) or the
    ``vnormal`` of the normal-velocity penalty kernels."""
    probe = NickelPlatingFlux(mode=0, PHI_E=PHI_E, T=T, c_total=c_total,
                              idx=idx, var=var)

    def v_n(sfv, mat, params):
        fl = probe._fluxes(sfv, mat, params)
        # deposited metal: Ni2+ + NiOH+ consumption rates
        return Vmolar * (fl[probe.i_ni] + fl[probe.i_nioh])

    return v_n


class PEMWaterFlux(FaceKernel):
    """YFLUX_H2O_ANODE / YFLUX_H2O_CATHODE (``src/mm_fill_species.c:2270
    mass_flux_surf_H2O_ANODE``, ``:2314 ..._CATHODE``): PEM fuel-cell water
    transport by electro-osmotic drag (+ product water at the cathode),
    transcribed verbatim:

        anode:   q = -ai0 Ha sqrt(c/cref) (alpha_a+alpha_c)/2
                     (Phi + U0)/(R T) nd
        cathode: q = -(nd + 2) (ai0 Hc / (4 F)) (c/cref)
                     exp(-alpha_c F/(R T) (V - Phi - U0))

    with Phi the electrolyte potential field; ``V`` the cell voltage
    (cathode only). Applied on species component ``comp``."""

    F = 96487.0
    GAS_R = 8.314

    def __init__(self, side: str, ai0: float, H: float, cref: float,
                 alpha_a: float, alpha_c: float, T: float, U0: float,
                 nd: float, V: float = 0.0, comp: int = 0,
                 var: str = "species", ncomp: int = 1):
        assert side in ("anode", "cathode")
        super().__init__(var, ncomp)
        self.side = side
        self.ai0, self.H, self.cref = ai0, H, cref
        self.alpha_a, self.alpha_c = alpha_a, alpha_c
        self.T, self.U0, self.nd, self.V = T, U0, nd, V
        self.comp = comp

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        Phi = sfv.val[POT_VAR][:, 0] if POT_VAR in sfv.val else 0.0
        c = sfv.val[self.var][:, self.comp]
        if self.side == "anode":
            cr = jnp.sqrt(jnp.maximum(c, 1e-30) / self.cref)
            q = -self.ai0 * self.H * cr * 0.5 \
                * (self.alpha_a + self.alpha_c) \
                * (Phi + self.U0) / (self.GAS_R * self.T) * self.nd
        else:
            cr = jnp.maximum(c, 1e-10) / self.cref
            grp = self.alpha_c * self.F / (self.GAS_R * self.T) \
                * (self.V - Phi - self.U0)
            q = -(self.nd + 2.0) * (self.ai0 * self.H / (4.0 * self.F)) \
                * cr * jnp.exp(-grp)
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.ncomp, phi.shape[1]), dtype=phi.dtype)
        # reference: *func -= mass_flux -> the net term entering the rows
        return out.at[:, self.comp, :].set(-q[:, None] * phi)
