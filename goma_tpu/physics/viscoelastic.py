"""Viscoelastic polymer stress: EVSS-F/DEVSS with SUPG, multimode.

Parity: reference ``src/mm_fill_stress.c`` — ``assemble_stress_fortin:1210``
(EVSS-F), multimode constitutive models (Oldroyd-B, Giesekus, PTT via
``polymer_time_const``/mode arrays, up to MAX_MODES=8), SUPG weighting, and
the velocity-gradient projection equation ``assemble_gradient:4597``.
Log-conformation (``assemble_stress_log_conf:2600``) is a planned follow-up.

Formulation (per mode m, stress S in symmetric components):

    R_S = w_i * [ S - 2 mu_p D
                  + lam * (Sdot + (u - xdot).grad S - G.S - S.G^T)
                  + (alpha lam / mu_p) S.S                      (Giesekus)
                  + (exp(eps lam tr(S)/mu_p) - 1) S ]           (exp. PTT)

with w_i = phi_i + tau_supg (u.grad phi_i) the SUPG weight and G the
L2-projected velocity gradient (the "F" of EVSS-F). The momentum equation
picks up div(S) through ``Momentum(ve_stress_modes=...)`` and the DEVSS
stabilization 2 mu_d (D(u) - sym(G)) via ``devss_mu``.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.fem.variables import sym_comps
from goma_tpu.physics.fluid import _as_nq, _sym_expand, advective_velocity
from goma_tpu.physics.materials import prop


def stress_var(mode: int) -> str:
    return f"stress{mode}"


class VelocityGradientProjection(Equation):
    """L2 projection G = grad(u): R_Gab = int phi_i (G_ab - du_a/dx_b).

    Components are row-major over the full (not symmetric) tensor.
    Reference: ``assemble_gradient`` (src/mm_fill_stress.c:4597).
    """

    def __init__(self, dim: int, interp: str = "Q1"):
        super().__init__("velocity_gradient", dim * dim, interp)
        self.dim = dim

    def residual(self, fv, mat, params):
        d = self.dim
        G = fv.val["velocity_gradient"].reshape(-1, d, d)  # (nq, d, d)
        gu = fv.grad["velocity"]
        phi = fv.phi["velocity_gradient"]
        diff = (G - gu).reshape(-1, d * d)
        return jnp.einsum("qc,qi->qci", diff, phi)


def full_from_comps(Gc, dim):
    return Gc.reshape(-1, dim, dim)


class VEStress(Equation):
    """One viscoelastic stress mode (symmetric components).

    model: "oldroyd_b" | "giesekus" | "ptt" (exponential) | "ptt_linear"
    """

    def __init__(
        self,
        mode: int,
        dim: int,
        lam: float,
        mu_p: float,
        model: str = "oldroyd_b",
        alpha: float = 0.0,
        eps_ptt: float = 0.0,
        interp: str = "Q1",
        supg: float = 0.5,
        use_projected_gradient: bool = True,
        transient: bool = True,
    ):
        ncomp = len(sym_comps(dim))
        super().__init__(stress_var(mode), ncomp, interp)
        self.mode = mode
        self.dim = dim
        self.lam = lam
        self.mu_p = mu_p
        self.model = model
        self.alpha = alpha
        self.eps_ptt = eps_ptt
        self.supg = supg
        self.use_projected_gradient = use_projected_gradient
        self.transient = transient

    def residual(self, fv, mat, params):
        d = self.dim
        comps = sym_comps(d)
        nq = fv.x.shape[0]
        var = self.var

        S = _sym_expand(fv.val[var], d)  # (nq, d, d)
        gu = fv.grad["velocity"]  # (nq, d, d)
        if self.use_projected_gradient and "velocity_gradient" in fv.val:
            L = full_from_comps(fv.val["velocity_gradient"], d)
        else:
            L = gu
        D = 0.5 * (gu + jnp.swapaxes(gu, 1, 2))
        u_adv = advective_velocity(fv)

        # material time derivative of S (components -> tensor)
        core = S - 2.0 * self.mu_p * D
        if self.lam > 0:
            conv = jnp.einsum(
                "qk,qabk->qab", u_adv,
                _sym_grad_expand(fv.grad[var], d),
            )
            LS = jnp.einsum("qac,qcb->qab", L, S)
            SLt = jnp.einsum("qac,qbc->qab", S, L)
            upper = conv - LS - SLt
            if self.transient:
                upper = upper + _sym_expand(fv.dot[var], d)
            core = core + self.lam * upper
            if self.model == "giesekus" and self.alpha != 0.0:
                SS = jnp.einsum("qac,qcb->qab", S, S)
                core = core + (self.alpha * self.lam / self.mu_p) * SS
            elif self.model in ("ptt", "ptt_linear") and self.eps_ptt != 0.0:
                trS = jnp.trace(S, axis1=1, axis2=2)
                z = self.eps_ptt * self.lam / self.mu_p * trS
                fac = jnp.exp(z) - 1.0 if self.model == "ptt" else z
                core = core + fac[:, None, None] * S

        # SUPG test function. tau = supg*h*|u| / (2|u|^2 + tiny): smooth at
        # u=0 (where it vanishes -- no streamline to stabilize along) and
        # AD-safe (jnp.linalg.norm has a NaN gradient at 0 under jacfwd).
        phi = fv.phi[var]  # (nq, nbf)
        if self.supg > 0:
            gphi = fv.gphi[var]
            u2 = jnp.sum(u_adv * u_adv, axis=1)
            tau = self.supg * fv.h_elem * jnp.sqrt(u2 + 1e-30) / (2.0 * u2 + 1e-12)
            w = phi + tau[:, None] * jnp.einsum("qk,qik->qi", u_adv, gphi)
        else:
            w = phi

        core_c = jnp.stack([core[:, a, b] for (a, b) in comps], axis=1)  # (nq, ncomp)
        return jnp.einsum("qc,qi->qci", core_c, w)


def _sym_grad_expand(gS, d):
    """grad of symmetric components (nq, ncomp, dim) -> (nq, d, d, dim)."""
    comps = sym_comps(d)
    idx = {}
    for ci, (a, b) in enumerate(comps):
        idx[(a, b)] = ci
        idx[(b, a)] = ci
    rows = []
    for a in range(d):
        cols = [gS[:, idx[(a, b)], :] for b in range(d)]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (nq, d, d, dim)
