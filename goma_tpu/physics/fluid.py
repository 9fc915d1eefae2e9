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

        # inertial terms
        inert = jnp.zeros((nq, dim))
        if self.transient:
            inert = inert + fv.dot["velocity"]
        if self.convection:
            inert = inert + jnp.einsum("qk,qak->qa", advective_velocity(fv), gu)
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
