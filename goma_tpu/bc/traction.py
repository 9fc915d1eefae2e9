"""Stress-based traction boundary conditions: Maxwell (electric) stress,
fully-developed outflow, and Coulomb friction.

Parity:
- ELEC_TRACTION / ELEC_TRACTION_SOLID (`/root/reference/src/mm_ns_bc.c:4443
  elec_surf_stress`): Maxwell stress Te = eps (E E - |E|^2/2 I), E = -grad V,
  contributes -int phi n.Te dG to the momentum (fluid) or mesh (solid) rows.
- FLOW_GRADV / FLOW_GRADV_T / FLOW_GRADV_SIC
  (`/root/reference/src/mm_ns_bc.c:6440 flow_n_dot_T_gradv`, `:6552
  flow_n_dot_T_gradv_t`): fully-developed open boundary replacing the
  natural traction with n.T, T = -p I + mu grad(v) (or its transpose); the
  SIC variant applies the same condition strongly (penalty here).
- FRICTION / FRICTION_RS / FRICTION_ACOUSTIC(_RS)
  (`/root/reference/src/mm_fill_solid.c:1910 friction_n_dot_f_bc`): Coulomb
  sliding friction on the tangential solid/mesh rows,
  t.TT.n = mu_f * fac * (n.TT.n) * (t.v_slide)/|v_slide|, with the acoustic
  variant reducing mu_f by fac = (2/pi) asin(|v|/v_acoustic) when the
  acoustic surface velocity exceeds the sliding speed.

All Jacobian blocks (the reference's d_cfunc/d_func hand-coded derivative
tails) come from AD of these residuals.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.fem.fields import MESH_VAR
from goma_tpu.physics.materials import prop


class ElecTraction(FaceKernel):
    """Maxwell-stress traction on a conductor/dielectric interface.

    Adds -int phi_a (n . Te)_a dG with Te = perm (E E - 0.5 |E|^2 I) and
    E = -grad(V) evaluated on this side of the interface (call from both
    sides with each material's permittivity for a dielectric/dielectric
    jump, exactly like the reference). ``var``: "velocity" for
    ELEC_TRACTION, the mesh/solid displacement for ELEC_TRACTION_SOLID.
    """

    def __init__(self, dim: int, permittivity=None, var: str = "velocity",
                 potential_var: str = "voltage", etm: float = 1.0):
        super().__init__(var, dim)
        self.dim = dim
        self.permittivity = permittivity
        self.potential_var = potential_var
        self.etm = etm

    def residual(self, sfv, mat, params):
        perm = self.permittivity
        if perm is None:
            perm = prop(mat, "permittivity", sfv, params, 1.0)
        E = -sfv.grad[self.potential_var][:, 0, :]  # (nq, dim)
        n = sfv.normal
        nE = jnp.einsum("qk,qk->q", n, E)
        E2 = jnp.einsum("qk,qk->q", E, E)
        nTe = perm * (nE[:, None] * E - 0.5 * E2[:, None] * n)
        phi = sfv.phi[self.var]
        return -self.etm * jnp.einsum("qa,qi->qai", nTe, phi)


class FlowGradV(FaceKernel):
    """Fully-developed outflow: replace the open-boundary traction with
    n.T, T = -p I + mu grad(v) (``transpose=False``, FLOW_GRADV) or
    -p I + mu grad(v)^T (FLOW_GRADV_T). ``p_datum=None`` uses the pressure
    field (reference iflag != -1); a float imposes that datum instead.
    ``penalty`` None applies the condition weakly (WEAK_INT_SURF); a float
    scales the same term as a strong penalty replacement (the SIC variant).
    """

    def __init__(self, dim: int, p_datum=None, transpose: bool = False,
                 penalty=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.p_datum = p_datum
        self.transpose = transpose
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        mu = prop(mat, "mu", sfv, params)
        if self.p_datum is None:
            press = sfv.val["pressure"][:, 0]
        else:
            pd = self.p_datum(sfv, mat, params) if callable(self.p_datum) \
                else self.p_datum
            press = jnp.broadcast_to(jnp.asarray(pd, dtype=sfv.x.dtype), (nq,))
        gv = sfv.grad["velocity"]  # (nq, a, k) = dv_a/dx_k
        n = sfv.normal
        if self.transpose:
            # FLOW_GRADV_T: n_q mu dv_p/dx_q = mu (n . grad) v
            nT = mu * jnp.einsum("qk,qak->qa", n, gv)
        else:
            # FLOW_GRADV: n_q mu grad_v[q][p] = n_q mu dv_q/dx_p
            # (reference grad_v[i][j] = dv_i/dx_j, mm_as_structs.h:1794) —
            # the choice that leaves fully-developed flow exact: combined
            # with the symmetric-stress natural term it weakly enforces
            # mu dv_n/dx_t = 0, not du_t/dn = 0
            nT = mu * jnp.einsum("qc,qca->qa", n, gv)
        nT = nT - press[:, None] * n
        phi = sfv.phi["velocity"]
        out = -jnp.einsum("qa,qi->qai", nT, phi)
        if self.penalty is not None:
            out = self.penalty * out
        return out


class CoulombFriction(FaceKernel):
    """Coulomb sliding friction on the tangential rows of a solid/mesh
    displacement equation (small-strain stress evaluated at the face):

        t . TT . n = mu_f * fac * (n . TT . n) * (t . v)/|v|

    applied weakly as the natural tangential traction (the prescribed
    right-hand side is computed from the current solution's normal stress,
    exactly as FLOW_GRADV computes its traction; the reference instead
    replaces the rotated tangential row strongly — the two converge to the
    same traction balance). Pair with a normal Dirichlet/contact condition.
    ``var`` picks the displacement field; the stress closure uses material
    keys (``mesh_shear_modulus``/``mesh_lambda`` for the mesh variable,
    ``lame_mu``/``lame_lambda`` otherwise). The sliding velocity is the
    variable's time derivative plus the optional ``slide_velocity``
    (constant/callable — use it for steady problems). ``acoustic_velocity``
    (constant or callable -> (nq,)) enables the FRICTION_ACOUSTIC reduction
    fac = (2/pi) asin(|v|/v_ac) for |v| < v_ac.
    """

    def __init__(self, dim: int, mu_f: float, var: str = MESH_VAR,
                 slide_velocity=None, acoustic_velocity=None):
        super().__init__(var, dim)
        self.dim = dim
        self.mu_f = mu_f
        self.slide_velocity = slide_velocity
        self.acoustic_velocity = acoustic_velocity

    def _stress(self, sfv, mat, params):
        if self.var == MESH_VAR:
            G = prop(mat, "mesh_shear_modulus", sfv, params, 1.0)
            lam = prop(mat, "mesh_lambda", sfv, params, 1.0)
        else:
            G = prop(mat, "lame_mu", sfv, params, 1.0)
            lam = prop(mat, "lame_lambda", sfv, params, 1.0)
        gd = sfv.grad[self.var]  # (nq, a, k)
        eps = 0.5 * (gd + jnp.swapaxes(gd, 1, 2))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        I = jnp.eye(self.dim)[None]
        return 2.0 * G * eps + lam * tr[:, None, None] * I

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        TT = self._stress(sfv, mat, params)
        n = sfv.normal
        nTT = jnp.einsum("qk,qka->qa", n, TT)
        n_force = jnp.einsum("qa,qa->q", nTT, n)

        v = sfv.dot[self.var]
        if self.slide_velocity is not None:
            sv = self.slide_velocity
            svv = sv(sfv, mat, params) if callable(sv) else jnp.broadcast_to(
                jnp.asarray(sv, dtype=sfv.x.dtype), (nq, self.dim))
            v = v + svv
        vmag = jnp.sqrt(jnp.einsum("qa,qa->q", v, v))
        # reference: zero relative velocity drops the friction term
        safe = jnp.where(vmag > 1e-12, vmag, 1.0)
        mu_eff = jnp.where(vmag > 1e-12, self.mu_f, 0.0)

        if self.acoustic_velocity is not None:
            av = self.acoustic_velocity
            vac = av(sfv, mat, params) if callable(av) else jnp.broadcast_to(
                jnp.asarray(av, dtype=sfv.x.dtype), (nq,))
            ratio = jnp.clip(vmag / jnp.maximum(vac, 1e-30), 0.0, 1.0)
            fac = jnp.where(vac > vmag, (2.0 / jnp.pi) * jnp.arcsin(ratio), 1.0)
            mu_eff = mu_eff * fac

        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.dim, phi.shape[1]), dtype=sfv.x.dtype)
        ntang = 1 if self.dim == 2 else 2
        for k in range(ntang):
            t = sfv.tangents[:, :, k]
            t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
            t_velo = jnp.einsum("qa,qa->q", t, v)
            # prescribed tangential traction g_t = mu_f fac (n.TT.n)(t.v)/|v|
            g_t = mu_eff * n_force * t_velo / safe
            out = out - jnp.einsum("q,qa,qi->qai", g_t, t, phi)
        return out


class SlopeBC(FaceKernel):
    """SLOPE / SLOPEX / SLOPEY / SLOPEZ (``src/mm_fill_solid.c:1234
    slope_n_dot_n0_bc``): drive the deformed boundary to be parallel to the
    prescribed slope vector s — the condition n . s = 0 imposed on the mesh
    displacement rows (component ``comp`` = 0/1/2 for SLOPEX/Y/Z, or the
    normal-projected row for the rotated SLOPE card, ``comp=None``),
    applied via penalty (the reference replaces the rotated row)."""

    def __init__(self, dim: int, slope, comp=None, var: str = MESH_VAR,
                 penalty: float = 1e4):
        super().__init__(var, dim)
        self.dim = dim
        self.slope = jnp.asarray(slope, dtype=float)
        self.comp = comp
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        n = sfv.normal
        s = jnp.einsum("qk,k->q", n, self.slope.astype(sfv.x.dtype))
        phi = sfv.phi[self.var]
        if self.comp is None:
            d = n
        else:
            d = jnp.zeros_like(n).at[:, self.comp].set(1.0)
        return self.penalty * jnp.einsum("q,qa,qi->qai", s, d, phi)


class ForceSIC(FaceKernel):
    """FORCE_SIC / FORCE_USER_SIC (``src/mm_fill_solid.c:1283
    force_n_dot_f_bc`` with the sic flag): strongly-integrated force
    balance on a solid/mesh boundary — the computed small-strain traction
    must equal the prescribed (normal, tangential) force components:

        n.TT.n = f_n,   t_k.TT.n = f_t_k

    applied as penalties on the normal/tangent-projected displacement rows
    (``force`` = (f_n, f_t1[, f_t2]) constants or a callable -> (nq, dim)
    for the USER variant). The weak FORCE card is the plain Traction
    kernel; this variant pins the traction pointwise."""

    def __init__(self, dim: int, force, var: str = MESH_VAR,
                 penalty: float = 1e4):
        super().__init__(var, dim)
        self.dim = dim
        self.force = force
        self.penalty = penalty

    def _stress(self, sfv, mat, params):
        if self.var == MESH_VAR:
            G = prop(mat, "mesh_shear_modulus", sfv, params, 1.0)
            lam = prop(mat, "mesh_lambda", sfv, params, 1.0)
        else:
            G = prop(mat, "lame_mu", sfv, params, 1.0)
            lam = prop(mat, "lame_lambda", sfv, params, 1.0)
        gd = sfv.grad[self.var]
        eps = 0.5 * (gd + jnp.swapaxes(gd, 1, 2))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        return 2.0 * G * eps + lam * tr[:, None, None] * jnp.eye(self.dim)[None]

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        f = self.force(sfv, mat, params) if callable(self.force) else \
            jnp.broadcast_to(jnp.asarray(self.force, dtype=sfv.x.dtype),
                             (nq, self.dim))
        TT = self._stress(sfv, mat, params)
        n = sfv.normal
        nTT = jnp.einsum("qk,qka->qa", n, TT)
        phi = sfv.phi[self.var]
        out = self.penalty * jnp.einsum(
            "q,qa,qi->qai", jnp.einsum("qa,qa->q", nTT, n) - f[:, 0], n, phi)
        for k in range(self.dim - 1):
            t = sfv.tangents[:, :, k]
            t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
            out = out + self.penalty * jnp.einsum(
                "q,qa,qi->qai",
                jnp.einsum("qa,qa->q", nTT, t) - f[:, 1 + k], t, phi)
        return out
