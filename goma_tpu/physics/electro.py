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
