"""Homogeneous reaction-network kinetics closure for species transport.

Parity: the reference's gas/surface kinetics hooks — Chemkin third-party
closures (``src/mm_chemkin.c``), the PLACID surface-site solver
(``src/mm_placid.c``) and SENKIN user ODE hook (``src/user_senkin.F``) —
which feed reaction source terms into ``assemble_mass_transport``
(``src/mm_fill_species.c``). Those wrap external Fortran/C libraries; here
the common core (elementary mass-action networks with Arrhenius rates and
optional reversible steps) is a first-class jittable closure pluggable as
the ``species_source`` material key, with every Jacobian contribution via
AD. Heat release feeds the energy equation through ``heat_source``.

    net = ReactionNetwork(
        nu=[[-1, -2, 1]],            # stoichiometry (n_rxn, n_species)
        A=[1e3], Ea=[10.0],          # Arrhenius k = A exp(-Ea/RT)
        orders=[[1, 2, 0]],          # forward orders (default: |nu_r| of
                                     # reactants)
        K_eq=[None],                 # reversible when set
        dH=[-5.0],                   # molar heat of reaction (optional)
    )
    mat = {"species_source": net.species_source,
           "heat_source": net.heat_source}
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GAS_R = 8.31446261815324


class ReactionNetwork:
    """Elementary mass-action network r_r = k_r(T) prod_w c_w^ord_rw
    (optionally minus the reverse rate k_r/K_eq prod c^ord_rev); species
    source S_w = sum_r nu_rw r_r; heat source Q = -sum_r dH_r r_r."""

    def __init__(self, nu, A, Ea=None, beta=None, orders=None, K_eq=None,
                 dH=None, T_ref=None):
        self.nu = np.asarray(nu, dtype=float)          # (nr, ns)
        nr, ns = self.nu.shape
        self.A = np.asarray(A, dtype=float)
        self.Ea = np.zeros(nr) if Ea is None else np.asarray(Ea, dtype=float)
        self.beta = np.zeros(nr) if beta is None else np.asarray(beta, dtype=float)
        if orders is None:
            orders = np.where(self.nu < 0, -self.nu, 0.0)
        self.orders = np.asarray(orders, dtype=float)
        self.rev_orders = np.where(self.nu > 0, self.nu, 0.0)
        self.K_eq = [None] * nr if K_eq is None else list(K_eq)
        self.dH = np.zeros(nr) if dH is None else np.asarray(dH, dtype=float)
        self.T_ref = T_ref

    def _rates(self, fv, params):
        c = jnp.maximum(fv.val["species"], 0.0)        # (nq, ns)
        if "temperature" in fv.val:
            T = fv.val["temperature"][:, 0]
        elif self.T_ref is not None:
            T = jnp.full(c.shape[0], self.T_ref, dtype=c.dtype)
        else:
            T = jnp.ones(c.shape[0], dtype=c.dtype)
        A = jnp.asarray(self.A, dtype=c.dtype)
        Ea = jnp.asarray(self.Ea, dtype=c.dtype)
        beta = jnp.asarray(self.beta, dtype=c.dtype)
        k = A[None, :] * T[:, None] ** beta[None, :] * jnp.exp(
            -Ea[None, :] / (GAS_R * T[:, None]))
        logc = jnp.log(jnp.maximum(c, 1e-300))
        fwd = jnp.exp(logc @ jnp.asarray(self.orders.T, dtype=c.dtype))
        r = k * fwd
        for j, Ke in enumerate(self.K_eq):
            if Ke is None:
                continue
            rev = jnp.exp(logc @ jnp.asarray(self.rev_orders[j], dtype=c.dtype))
            r = r.at[:, j].add(-(k[:, j] / Ke) * rev)
        return r

    def species_source(self, fv, mat, params):
        """(nq, ns) molar production rates (``species_source`` closure)."""
        r = self._rates(fv, params)
        return r @ jnp.asarray(self.nu, dtype=r.dtype)

    def heat_source(self, fv, mat, params):
        """(nq,) volumetric heat release -sum_r dH_r r_r."""
        r = self._rates(fv, params)
        return -(r @ jnp.asarray(self.dH, dtype=r.dtype))
