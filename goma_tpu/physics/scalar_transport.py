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

from goma_tpu.fem.equations import Equation
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
