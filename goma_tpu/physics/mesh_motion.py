"""ALE mesh-motion equations.

Parity: reference ``src/mm_fill_elliptic_mesh.c:63 assemble_elliptic_mesh``
(elliptic smoothing PDE) and the pseudo-solid ALE mesh equation
(``src/mm_fill_terms.c:109 assemble_mesh`` + ``belly_flop`` deformation
gradient, ``src/mm_fill_solid.c:77``). Both are total-Lagrangian: integrals
and gradients live in the *reference* configuration (fv.grad0 / fv.wdetJ0),
so the assembler must scale these contributions by wdetJ0 rather than the
current measure — equations flag this with ``measure='reference'``.

The mesh-position sensitivities that the reference hand-codes through
``load_fv_mesh_derivs`` (src/load_field_variables.c:3754) arrive via AD:
every other equation's residual depends on x = X0 + d, so jacfwd produces
the full coupled Jacobian blocks automatically.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.fem.fields import MESH_VAR
from goma_tpu.physics.materials import prop


class EllipticMesh(Equation):
    """Laplace smoothing of mesh displacement in the reference frame:
    int grad0(phi_i) : grad0(d)."""

    measure = "reference"

    def __init__(self, dim: int, interp: str = "Q2"):
        super().__init__(MESH_VAR, dim, interp)
        self.dim = dim

    def residual(self, fv, mat, params):
        gd = fv.grad0[MESH_VAR]  # (nq, dim, dim)
        gphi = fv.gphi0[MESH_VAR]  # (nq, nbf, dim)
        return jnp.einsum("qak,qik->qai", gd, gphi)


class PseudoSolidMesh(Equation):
    """Compressible neo-Hookean pseudo-solid mesh equation (total Lagrangian):
    int grad0(phi) : P(F),  P = G (F - F^-T) + lam ln(det F) F^-T.

    Material keys: ``mesh_shear_modulus`` (G), ``mesh_lambda`` (lam).
    """

    measure = "reference"

    def __init__(self, dim: int, interp: str = "Q2"):
        super().__init__(MESH_VAR, dim, interp)
        self.dim = dim

    def residual(self, fv, mat, params):
        from goma_tpu.utils.la import det_and_inv

        nq = fv.X0.shape[0]
        F = fv.F  # (nq, dim, dim)
        G = prop(mat, "mesh_shear_modulus", fv, params, 1.0)
        lam = prop(mat, "mesh_lambda", fv, params, 1.0)
        J, Finv = det_and_inv(F)
        gphi = fv.gphi0[MESH_VAR]
        axisym = fv.coord in ("cylindrical", "swirling") and F.shape[-1] == 2
        if axisym:
            # axisym deformation gradient has F_tt = r/r0 = 1 + d_r/r0;
            # J3 = det(F2) F_tt, and P_tt tests against phi/r0 on r rows
            r0 = fv.X0[:, 1]
            r0 = jnp.where(jnp.abs(r0) < 1e-30, 1.0, r0)
            Ftt = 1.0 + fv.val[MESH_VAR][:, 1] / r0
            J = J * Ftt
        FinvT = jnp.swapaxes(Finv, 1, 2)
        P = G * (F - FinvT) + (lam * jnp.log(J))[:, None, None] * FinvT
        out = jnp.einsum("qak,qik->qai", P, gphi)
        if axisym:
            Ptt = G * (Ftt - 1.0 / Ftt) + lam * jnp.log(J) / Ftt
            hoop = jnp.einsum("q,qi->qi", Ptt / r0, fv.phi[MESH_VAR])
            out = out + jnp.stack([jnp.zeros_like(hoop), hoop], axis=1)
        return out


class LinearElasticMesh(Equation):
    """Small-strain linear elastic mesh motion (reference LINEAR model):
    int grad0(phi) : sigma,  sigma = 2 G eps(d) + lam tr(eps) I."""

    measure = "reference"

    def __init__(self, dim: int, interp: str = "Q2"):
        super().__init__(MESH_VAR, dim, interp)
        self.dim = dim

    def residual(self, fv, mat, params):
        G = prop(mat, "mesh_shear_modulus", fv, params, 1.0)
        lam = prop(mat, "mesh_lambda", fv, params, 1.0)
        gd = fv.grad0[MESH_VAR]
        eps = 0.5 * (gd + jnp.swapaxes(gd, 1, 2))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        dim = eps.shape[-1]
        gphi = fv.gphi0[MESH_VAR]
        axisym = fv.coord in ("cylindrical", "swirling") and dim == 2
        if axisym:
            # hoop strain eps_tt = d_r / r0 enters tr(eps) and adds the
            # sigma_tt (phi/r0) weak term on the r rows
            r0 = fv.X0[:, 1]
            r0 = jnp.where(jnp.abs(r0) < 1e-30, 1.0, r0)
            eps_tt = fv.val[MESH_VAR][:, 1] / r0
            tr = tr + eps_tt
        sig = 2.0 * G * eps + lam * tr[:, None, None] * jnp.eye(dim)[None]
        out = jnp.einsum("qak,qik->qai", sig, gphi)
        if axisym:
            sig_tt = 2.0 * G * eps_tt + lam * tr
            hoop = jnp.einsum("q,qi->qi", sig_tt / r0, fv.phi[MESH_VAR])
            out = out + jnp.stack([jnp.zeros_like(hoop), hoop], axis=1)
        return out
