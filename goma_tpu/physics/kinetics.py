"""Homogeneous reaction-network kinetics closure for species transport.

Parity: the reference's gas/surface kinetics hooks — Chemkin third-party
closures (``src/mm_chemkin.c``), the PLACID surface-site solver
(``src/mm_placid.c``) and SENKIN user ODE hook (``src/user_senkin.F``) —
which feed reaction source terms into ``assemble_mass_transport``
(``src/mm_fill_species.c``). Those wrap external Fortran/C libraries; here
the full gas-phase core is a first-class jittable closure pluggable as
the ``species_source`` material key, with every Jacobian contribution via
AD. Heat release feeds the energy equation through ``heat_source``.

Covered mechanism features (the Chemkin-II rate laws):
- elementary mass-action with modified Arrhenius k = A T^beta exp(-Ea/RT)
- reversible steps via constant K_eq, explicit reverse Arrhenius (REV),
  or NASA-7 thermodynamic equilibrium (THERMO block): Kp from
  exp(dS/R - dH/RT), Kc = Kp (P_atm/RT)^dnu
- third-body reactions (+M) with per-species enhanced efficiencies
- unimolecular falloff (+M)/(+collider): Lindemann, Troe, and SRI
  blending functions from LOW/TROE/SRI auxiliary data
- pressure-log (PLOG) rate interpolation at a fixed thermodynamic pressure
- DUPLICATE reactions (parallel rows add naturally)

    net = ReactionNetwork(
        nu=[[-1, -2, 1]],            # stoichiometry (n_rxn, n_species)
        A=[1e3], Ea=[10.0],          # Arrhenius k = A exp(-Ea/RT)
        orders=[[1, 2, 0]],          # forward orders (default: |nu_r| of
                                     # reactants)
        K_eq=[None],                 # reversible when set ("thermo" uses
                                     # NASA data)
        dH=[-5.0],                   # molar heat of reaction (optional)
    )
    mat = {"species_source": net.species_source,
           "heat_source": net.heat_source}
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GAS_R = 8.31446261815324

#: (R in energy/(mol K), P_atm) pairs fixing the concentration units used
#: for thermodynamic Kc conversion: SI = mol/m^3, CGS = mol/cm^3 (the
#: Chemkin convention, where A carries cm-mol-s units).
_UNITS = {
    "si": (GAS_R, 101325.0),
    "cgs": (GAS_R * 1.0e7, 1.01325e6),
}


class Nasa7:
    """NASA 7-coefficient polynomial thermo data for one species.

    ``a_low`` applies below ``T_mid``, ``a_high`` above; both are the
    standard (a1..a7) sets defining Cp/R, H/RT and S/R.
    """

    def __init__(self, a_low, a_high, T_mid=1000.0, T_low=300.0,
                 T_high=5000.0):
        self.a_low = np.asarray(a_low, dtype=float)
        self.a_high = np.asarray(a_high, dtype=float)
        assert self.a_low.shape == (7,) and self.a_high.shape == (7,)
        self.T_mid = float(T_mid)
        self.T_low = float(T_low)
        self.T_high = float(T_high)

    def h_over_RT(self, T):
        def f(a):
            return (a[0] + a[1] * T / 2 + a[2] * T**2 / 3 + a[3] * T**3 / 4
                    + a[4] * T**4 / 5 + a[5] / T)
        return jnp.where(T < self.T_mid, f(self.a_low), f(self.a_high))

    def s_over_R(self, T):
        def f(a):
            return (a[0] * jnp.log(T) + a[1] * T + a[2] * T**2 / 2
                    + a[3] * T**3 / 3 + a[4] * T**4 / 4 + a[6])
        return jnp.where(T < self.T_mid, f(self.a_low), f(self.a_high))


class ReactionNetwork:
    """Elementary mass-action network r_r = k_r(T,[M],P) prod_w c_w^ord_rw
    (optionally minus a reverse rate); species source S_w = sum_r nu_rw r_r;
    heat source Q = -sum_r dH_r r_r.

    Optional per-reaction feature lists (length n_rxn, ``None`` = off):

    - ``third_body[j]``: ``{}``/dict of per-species efficiencies (default
      1.0 each; ``{"collider": sid}`` pins [M] to one species) — the rate
      (both directions) is multiplied by [M].
    - ``falloff[j]``: ``{"low": (A0, b0, Ea0)[, "troe": (a, T3, T1[, T2])]
      [, "sri": (a, b, c[, d, e])]}`` — unimolecular falloff blending;
      the matching ``third_body[j]`` supplies the collider for Pr.
    - ``rev_arrhenius[j]``: (A, b, Ea) explicit reverse rate (REV card).
    - ``plog[j]``: [(P, A, b, Ea), ...] — ln-k interpolation in ln P at
      the fixed ``pressure`` attribute.
    - ``K_eq[j]``: number (constant), or the string ``"thermo"`` to use
      ``thermo`` NASA-7 data (list of :class:`Nasa7` or None per species).
    """

    def __init__(self, nu, A, Ea=None, beta=None, orders=None, K_eq=None,
                 dH=None, T_ref=None, third_body=None, falloff=None,
                 rev_arrhenius=None, plog=None, thermo=None, pressure=None,
                 units="si"):
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
        self.third_body = [None] * nr if third_body is None else list(third_body)
        self.falloff = [None] * nr if falloff is None else list(falloff)
        self.rev_arrhenius = ([None] * nr if rev_arrhenius is None
                              else list(rev_arrhenius))
        self.plog = [None] * nr if plog is None else list(plog)
        self.thermo = thermo                           # list[Nasa7|None]|None
        self.pressure = pressure
        if units not in _UNITS:
            raise ValueError(f"units must be one of {sorted(_UNITS)}")
        self.units = units
        for j in range(nr):
            if self.falloff[j] is not None and self.third_body[j] is None:
                self.third_body[j] = {}
            if self.K_eq[j] == "thermo":
                if self.thermo is None:
                    raise ValueError(f"reaction {j}: K_eq='thermo' requires "
                                     "NASA thermo data")
                for sid in np.nonzero(self.nu[j])[0]:
                    if self.thermo[sid] is None:
                        raise ValueError(
                            f"reaction {j}: no thermo data for species {sid}")

    # ---------------------------------------------------------------- rates
    def _arrhenius(self, T, A, beta, Ea):
        return A * T**beta * jnp.exp(-Ea / (GAS_R * T))

    def _conc_M(self, j, c):
        """Effective third-body concentration [M] at each qp."""
        tb = self.third_body[j]
        if tb and "collider" in tb:
            return c[:, tb["collider"]]
        eff = np.ones(c.shape[1])
        if tb:
            for sid, e in tb.items():
                eff[sid] = e
        return c @ jnp.asarray(eff, dtype=c.dtype)

    def _k_forward(self, j, T, M, dtype):
        """Rate coefficient of reaction j incl. plog/falloff blending."""
        if self.plog[j] is not None:
            return self._k_plog(j, T)
        k_inf = self._arrhenius(T, self.A[j], self.beta[j], self.Ea[j])
        fo = self.falloff[j]
        if fo is None:
            return k_inf
        A0, b0, Ea0 = fo["low"]
        k0 = self._arrhenius(T, A0, b0, Ea0)
        Pr = jnp.maximum(k0 * M / jnp.maximum(k_inf, 1e-300), 1e-30)
        F = jnp.ones_like(T)
        if "troe" in fo:
            t = fo["troe"]
            a, T3, T1 = t[0], t[1], t[2]
            Fc = (1 - a) * jnp.exp(-T / T3) + a * jnp.exp(-T / T1)
            if len(t) > 3 and t[3] is not None:
                Fc = Fc + jnp.exp(-t[3] / T)
            logFc = jnp.log10(jnp.maximum(Fc, 1e-300))
            cc = -0.4 - 0.67 * logFc
            nn = 0.75 - 1.27 * logFc
            lpr = jnp.log10(Pr) + cc
            F = 10.0 ** (logFc / (1.0 + (lpr / (nn - 0.14 * lpr)) ** 2))
        elif "sri" in fo:
            s = fo["sri"]
            a, b, cpar = s[0], s[1], s[2]
            d = s[3] if len(s) > 3 else 1.0
            e = s[4] if len(s) > 4 else 0.0
            X = 1.0 / (1.0 + jnp.log10(Pr) ** 2)
            F = d * (a * jnp.exp(-b / T) + jnp.exp(-T / cpar)) ** X * T**e
        return k_inf * Pr / (1.0 + Pr) * F

    def _k_plog(self, j, T):
        if self.pressure is None:
            raise ValueError(f"reaction {j} uses PLOG; set pressure=")
        pts = sorted(self.plog[j])
        lnP = float(np.log(self.pressure))
        lks = [jnp.log(jnp.maximum(
            self._arrhenius(T, A, b, Ea), 1e-300)) for _, A, b, Ea in pts]
        lPs = [float(np.log(P)) for P, *_ in pts]
        if len(pts) == 1 or lnP <= lPs[0]:
            return jnp.exp(lks[0])
        if lnP >= lPs[-1]:
            return jnp.exp(lks[-1])
        i = int(np.searchsorted(lPs, lnP)) - 1
        w = (lnP - lPs[i]) / (lPs[i + 1] - lPs[i])
        return jnp.exp((1 - w) * lks[i] + w * lks[i + 1])

    def _Kc(self, j, T):
        """Equilibrium constant in concentration units for reaction j."""
        Ke = self.K_eq[j]
        if Ke != "thermo":
            return Ke
        R_u, P_atm = _UNITS[self.units]
        dS = jnp.zeros_like(T)
        dH = jnp.zeros_like(T)
        for sid in np.nonzero(self.nu[j])[0]:
            th = self.thermo[sid]
            dS = dS + self.nu[j, sid] * th.s_over_R(T)
            dH = dH + self.nu[j, sid] * th.h_over_RT(T)
        Kp = jnp.exp(dS - dH)
        dn = float(self.nu[j].sum())
        return Kp * (P_atm / (R_u * T)) ** dn

    def _rates(self, fv, params):
        c = jnp.maximum(fv.val["species"], 0.0)        # (nq, ns)
        if "temperature" in fv.val:
            T = fv.val["temperature"][:, 0]
        elif self.T_ref is not None:
            T = jnp.full(c.shape[0], self.T_ref, dtype=c.dtype)
        else:
            T = jnp.ones(c.shape[0], dtype=c.dtype)
        logc = jnp.log(jnp.maximum(c, 1e-300))
        fwd = jnp.exp(logc @ jnp.asarray(self.orders.T, dtype=c.dtype))
        nr = self.nu.shape[0]
        cols = []
        for j in range(nr):
            M = (self._conc_M(j, c)
                 if self.third_body[j] is not None else None)
            k = self._k_forward(j, T, M, c.dtype)
            r_j = k * fwd[:, j]
            if self.rev_arrhenius[j] is not None:
                Ar, br, Ear = self.rev_arrhenius[j]
                k_rev = self._arrhenius(T, Ar, br, Ear)
            elif self.K_eq[j] is not None:
                k_rev = k / self._Kc(j, T)
            else:
                k_rev = None
            if k_rev is not None:
                rev = jnp.exp(logc @ jnp.asarray(self.rev_orders[j],
                                                 dtype=c.dtype))
                r_j = r_j - k_rev * rev
            if M is not None and self.falloff[j] is None:
                r_j = r_j * M                          # three-body [M]
            cols.append(r_j)
        return jnp.stack(cols, axis=1)                 # (nq, nr)

    def species_source(self, fv, mat, params):
        """(nq, ns) molar production rates (``species_source`` closure)."""
        r = self._rates(fv, params)
        return r @ jnp.asarray(self.nu, dtype=r.dtype)

    def heat_source(self, fv, mat, params):
        """(nq,) volumetric heat release -sum_r dH_r r_r."""
        r = self._rates(fv, params)
        return -(r @ jnp.asarray(self.dH, dtype=r.dtype))
