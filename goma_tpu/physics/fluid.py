"""Incompressible fluid momentum + continuity.

Parity: reference ``src/mm_fill_momentum.c:98 assemble_momentum`` and
``src/mm_fill_continuity.c:113 assemble_continuity`` with the PSPG/SUPG
stabilization formulas of ``src/mm_fill_stabilization.c`` (Shakib tau).

Weak forms (Galerkin):
  momentum:   R_ai = int phi_i rho (udot_a + u.grad u_a - f_a)
                   + grad(phi_i) : sigma_a   dOmega
              sigma = -p I + mu (grad u + grad u^T) + sigma_ve (polymer)
  continuity: R_i = int psi_i (div u) dOmega  (+ PSPG)
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.physics.materials import prop


def _as_nq(a, nq):
    a = jnp.asarray(a)
    if a.ndim == 0:
        return jnp.broadcast_to(a, (nq,))
    return a


def advective_velocity(fv, var: str = "velocity"):
    """ALE advective velocity u - d_dot(mesh): the convection seen at a mesh
    point (reference: x_dot subtraction throughout mm_fill_*.c for ALE)."""
    from goma_tpu.fem.fields import MESH_VAR

    if var not in fv.val:
        # pure-transport problems with no flow field (e.g. a pinned fill
        # used as a frozen distance function): zero advection
        dim = fv.x.shape[1]
        return jnp.zeros((fv.x.shape[0], dim), dtype=fv.x.dtype)
    u = fv.val[var]
    if MESH_VAR in fv.dot:
        return u - fv.dot[MESH_VAR]
    return u


class Momentum(Equation):
    """Navier-Stokes momentum.

    Options: ``transient`` includes rho*udot; ``convection`` the advective
    term; ``body_force`` material key returning (nq, dim) acceleration (or
    constant vector in material dict); ``ve_stress_modes`` adds the polymer
    stress divergence term div(S) weakly for EVSS-F coupling.
    """

    def __init__(
        self,
        dim: int,
        interp: str = "Q2",
        transient: bool = True,
        convection: bool = True,
        ve_stress_modes: int = 0,
        devss_mu: float = 0.0,
        logconf_modes: tuple = (),
        sqrtconf_modes: tuple = (),
        supg: float = 0.0,
    ):
        super().__init__("velocity", dim, interp)
        self.dim = dim
        self.transient = transient
        self.convection = convection
        self.ve_stress_modes = ve_stress_modes
        # ((mode, lam, mu_p), ...) log-conformation modes contributing
        # tau = mu_p/lam (exp(Psi) - I)
        self.logconf_modes = tuple(logconf_modes)
        # ((mode, lam, mu_p), ...) sqrt-conformation modes:
        # tau = mu_p/lam (b b^T - I)
        self.sqrtconf_modes = tuple(sqrtconf_modes)
        # momentum SUPG (reference supg in assemble_momentum / Shakib tau)
        self.supg = supg
        # DEVSS stabilization 2*mu_d*(D(u) - sym(G)) with G the projected
        # velocity gradient (reference: DEVSS/EVSS-F Fortin formulation)
        self.devss_mu = devss_mu

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        dim = self.dim
        u = fv.val["velocity"]  # (nq, dim)
        gu = fv.grad["velocity"]  # (nq, dim, dim): gu[q,a,k] = du_a/dx_k
        p = fv.val["pressure"][:, 0]  # (nq,)
        rho = _as_nq(prop(mat, "rho", fv, params, 1.0), nq)
        mu = _as_nq(prop(mat, "mu", fv, params), nq)

        phi = fv.phi["velocity"]  # (nq, nbf)
        gphi = fv.gphi["velocity"]  # (nq, nbf, dim)

        axisym = fv.coord in ("cylindrical", "swirling") and dim == 2

        # inertial terms
        inert = jnp.zeros((nq, dim))
        if self.transient:
            inert = inert + fv.dot["velocity"]
        if self.convection:
            inert = inert + jnp.einsum("qk,qak->qa", advective_velocity(fv), gu)
        if axisym and "swirl" in fv.val and self.convection:
            # centrifugal -rho w^2 / r in the r-momentum (reference: the
            # hq[2][1] curvature terms of assemble_momentum in SWIRLING)
            w = fv.val["swirl"][:, 0]
            inert = inert - jnp.stack(
                [jnp.zeros_like(w), w * w / fv.r], axis=1)
        f = mat.get("body_force", None)
        if f is not None:
            fval = f(fv, mat, params) if callable(f) else jnp.broadcast_to(jnp.asarray(f), (nq, dim))
            inert = inert - fval
        contrib = jnp.einsum("qa,qi->qai", rho[:, None] * inert, phi)

        # stress: sigma[q,a,k] = -p delta + mu (gu + gu^T)
        tau = mu[:, None, None] * (gu + jnp.swapaxes(gu, 1, 2))
        sigma = tau - p[:, None, None] * jnp.eye(dim)[None, :, :]
        if self.ve_stress_modes > 0:
            for m in range(self.ve_stress_modes):
                S = _sym_expand(fv.val[f"stress{m}"], dim)  # (nq, dim, dim)
                sigma = sigma + S
        for m, lam_m, mup_m in self.logconf_modes:
            from goma_tpu.physics.viscoelastic import logconf_stress_tensor

            sigma = sigma + logconf_stress_tensor(fv, m, lam_m, mup_m)
        for m, lam_m, mup_m in self.sqrtconf_modes:
            from goma_tpu.physics.viscoelastic import sqrtconf_stress_tensor

            sigma = sigma + sqrtconf_stress_tensor(fv, m, lam_m, mup_m)
        if self.devss_mu > 0.0 and "velocity_gradient" in fv.val:
            G = fv.val["velocity_gradient"].reshape(-1, dim, dim)
            Dg = 0.5 * (G + jnp.swapaxes(G, 1, 2))
            Du = 0.5 * (gu + jnp.swapaxes(gu, 1, 2))
            sigma = sigma + 2.0 * self.devss_mu * (Du - Dg)
        contrib = contrib + jnp.einsum("qak,qik->qai", sigma, gphi)

        if axisym:
            # hoop stress sigma_tt = -p + 2 mu u_r/r: the theta-theta entry
            # of grad(v) for v = phi e_r is phi/r, so the weak form gains
            # int sigma_tt (phi/r) r dOmega (r-momentum rows). Reference:
            # grad(e_r)_tt scale-factor terms via load_coordinate_scales
            # (src/mm_fill_aux.c) inside assemble_momentum.
            u_r = u[:, 1]
            sig_tt = -p + 2.0 * mu * u_r / fv.r
            # polymer hoop stress (the reference's s33 slot): supplied by
            # AxisymHoopStress companion equations per mode
            for m in range(self.ve_stress_modes):
                tt = f"stress{m}_tt"
                if tt in fv.val:
                    sig_tt = sig_tt + fv.val[tt][:, 0]
            hoop = jnp.einsum("q,qi->qi", sig_tt / fv.r, phi)
            contrib = contrib + jnp.stack(
                [jnp.zeros_like(hoop), hoop], axis=1)

        if self.supg > 0.0:
            # streamline stabilization with the strong inertial+pressure
            # residual (Shakib-style tau, reference tau_momentum_shakib)
            u_adv = advective_velocity(fv)
            h = fv.h_elem
            u2 = jnp.sum(u_adv * u_adv, axis=1)
            unorm = jnp.sqrt(u2 + 1e-30)
            tau = self.supg / jnp.sqrt(
                (2.0 * rho * unorm / h) ** 2 + (4.0 * mu / h**2) ** 2 + 1e-30
            )
            gp = fv.grad["pressure"][:, 0, :]
            rm = rho[:, None] * inert + gp
            wsup = jnp.einsum("qk,qik->qi", u_adv, gphi)
            contrib = contrib + jnp.einsum("q,qa,qi->qai", tau, rm, wsup)
        return contrib


def _sym_expand(s, dim):
    """(nq, ncomp symmetric) -> (nq, dim, dim)."""
    if dim == 2:
        s11, s12, s22 = s[:, 0], s[:, 1], s[:, 2]
        return jnp.stack(
            [jnp.stack([s11, s12], axis=1), jnp.stack([s12, s22], axis=1)], axis=1
        )
    s11, s12, s22, s13, s23, s33 = [s[:, i] for i in range(6)]
    r0 = jnp.stack([s11, s12, s13], axis=1)
    r1 = jnp.stack([s12, s22, s23], axis=1)
    r2 = jnp.stack([s13, s23, s33], axis=1)
    return jnp.stack([r0, r1, r2], axis=1)


class Continuity(Equation):
    """div(u) = 0 tested with pressure basis; optional PSPG for equal-order.

    Reference: ``assemble_continuity`` + ``calc_pspg``
    (``src/mm_fill_stabilization.c:691``).
    """

    def __init__(self, interp: str = "Q1", pspg: float = 0.0):
        super().__init__("pressure", 1, interp)
        self.pspg = pspg

    def residual(self, fv, mat, params):
        nq = fv.x.shape[0]
        gu = fv.grad["velocity"]
        divu = jnp.trace(gu, axis1=1, axis2=2)  # (nq,)
        if fv.coord in ("cylindrical", "swirling"):
            # axisym: div u = du_z/dz + (1/r) d(r u_r)/dr = 2D div + u_r/r
            divu = divu + fv.val["velocity"][:, 1] / fv.r
        psi = fv.phi["pressure"]  # (nq, nbf)
        # volumetric mass source: div(u) = s (reference: the foam/REF volume
        # sources of assemble_continuity, src/mm_fill_continuity.c)
        S = mat.get("mass_source", None)
        if S is not None:
            sval = S(fv, mat, params) if callable(S) else jnp.broadcast_to(
                jnp.asarray(S), (nq,))
            divu = divu - sval
        contrib = jnp.einsum("q,qi->qi", divu, psi)[:, None, :]
        if self.pspg > 0.0:
            rho = _as_nq(prop(mat, "rho", fv, params, 1.0), nq)
            mu = _as_nq(prop(mat, "mu", fv, params), nq)
            u = fv.val["velocity"]
            # Shakib-style tau (reference tau_momentum_shakib:143)
            h = fv.h_elem
            unorm = jnp.sqrt(jnp.sum(u * u, axis=1) + 1e-30)  # AD-safe at u=0
            tau = self.pspg / jnp.sqrt(
                (2.0 * rho * unorm / h) ** 2 + (4.0 * mu / h**2) ** 2 + 1e-30
            )
            # momentum strong residual approx: rho(u.grad u) + grad p
            gp = fv.grad["pressure"][:, 0, :]  # (nq, dim)
            rm = rho[:, None] * jnp.einsum("qk,qak->qa", u, gu) + gp
            gpsi = fv.gphi["pressure"]  # (nq, nbf, dim)
            contrib = contrib + jnp.einsum("q,qa,qia->qi", tau / jnp.maximum(rho, 1e-30), rm, gpsi)[
                :, None, :
            ]
        return contrib


class SwirlMomentum(Equation):
    """Azimuthal (theta) momentum for axisymmetric SWIRLING flow: scalar
    swirl velocity w = v_theta(z, r) on a 2D (z, r) mesh.

    Weak form (test function phi e_theta, axisymmetric):

        int rho (wdot + u.grad w + u_r w / r) phi  r dOmega
      + int [ tau_tz dphi/dz + tau_tr (dphi/dr - phi/r) ]  r dOmega

    with the physical shear stresses tau_tz = mu dw/dz and
    tau_tr = mu (dw/dr - w/r) = mu r d(w/r)/dr. Exact solution check:
    circular Couette w = A r + B/r has r^2 tau_tr = -2 mu B constant, so the
    residual vanishes identically. Reference: the VELOCITY3 swirl component
    of assemble_momentum in SWIRLING coordinates (src/mm_fill_momentum.c +
    src/mm_fill_aux.c scale factors).
    """

    def __init__(self, interp: str = "Q2", transient: bool = True,
                 convection: bool = True):
        super().__init__("swirl", 1, interp)
        self.transient = transient
        self.convection = convection

    def residual(self, fv, mat, params):
        if fv.coord != "swirling":
            raise ValueError("SwirlMomentum requires Problem(coord='swirling')")
        nq = fv.x.shape[0]
        rho = _as_nq(prop(mat, "rho", fv, params, 1.0), nq)
        mu = _as_nq(prop(mat, "mu", fv, params), nq)
        w = fv.val["swirl"][:, 0]
        gw = fv.grad["swirl"][:, 0, :]  # (nq, 2): [dw/dz, dw/dr]
        r = fv.r
        phi = fv.phi["swirl"]
        gphi = fv.gphi["swirl"]  # (nq, nbf, 2)

        inert = jnp.zeros((nq,))
        if self.transient:
            inert = inert + fv.dot["swirl"][:, 0]
        if self.convection and "velocity" in fv.val:
            u = advective_velocity(fv)
            inert = inert + jnp.einsum("qk,qk->q", u, gw) + u[:, 1] * w / r
        contrib = jnp.einsum("q,qi->qi", rho * inert, phi)

        tau_tz = mu * gw[:, 0]
        tau_tr = mu * (gw[:, 1] - w / r)
        contrib = contrib + jnp.einsum("q,qi->qi", tau_tz, gphi[:, :, 0])
        contrib = contrib + jnp.einsum("q,qi->qi", tau_tr,
                                       gphi[:, :, 1] - phi / r[:, None])
        return contrib[:, None, :]
