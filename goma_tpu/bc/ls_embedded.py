"""LS embedded-interface wall BCs + melt-front distinguishing conditions.

Parity targets:

- ``LS_ATTACH`` (``src/bc_integ.c:549`` dispatch; ``ls_attach_bc``,
  ``src/mm_ns_bc.c:308``): strong-integrated condition on the wall-normal
  momentum rows pulling the fluid onto the wall near the level-set contact
  line,

      u.n - v_attach * delta(F) * (n_F . n_wall)^4 * L = 0

  with L a boundary length scale (the reference uses 2*sdet in 2D) and
  n_F = grad F/|grad F|. Implemented, like the repo's other
  strong-integrated conditions, as a penalty face kernel.
- ``LS_WALL_ANGLE`` (``src/bc_integ.c:555``; ``ls_wall_angle_bc``,
  ``src/mm_ns_bc.c:16273``): strong-integrated on the FILL rows enforcing
  the level-set wall contact angle, grad(F) . n_wall = cos(theta) (exact
  for a signed-distance fill field).
- ``LS_CA_H`` (``src/bc_integ.c:1754``; ``boundary_curvature`` CA branch,
  ``src/mm_fill_fill.c:3774,:72``): the wall boundary term of the
  integrated-by-parts curvature projection replaced by the prescribed
  contact angle, func = +cos(CA) instead of -(n_F . n_wall).
- ``DISTNG / DXDISTNG / DYDISTNG / DZDISTNG`` (``src/bc_colloc.c:301``;
  ``fTmelting``): collocated distinguishing condition pinning a mesh
  boundary to the melting isotherm, func = T - T_melt on a mesh
  displacement row — the classic solidification-front capability. Use
  :func:`add_distng` (multi-variable point constraint with temperature in
  the gather).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from goma_tpu.fem.equations import FaceKernel
from goma_tpu.physics.level_set import FILL_VAR, delta


class LSAttach(FaceKernel):
    """LS_ATTACH: penalty-strong u.n = v_attach * delta(F) (n_F.n_w)^4 L on
    wall sidesets; pulls the interface's contact line onto the wall."""

    def __init__(self, dim: int, v_attach: float, penalty: float = 1e6,
                 eps=None):
        super().__init__("velocity", dim)
        self.dim = dim
        self.v_attach = v_attach
        self.penalty = penalty
        self.eps = eps

    def residual(self, sfv, mat, params):
        eps = self.eps if self.eps is not None else params["ls_eps"]
        F = sfv.val[FILL_VAR][:, 0]
        gF = sfv.grad[FILL_VAR][:, 0, :]
        nf = gF / jnp.maximum(jnp.linalg.norm(gF, axis=1, keepdims=True),
                              1e-30)
        nw = sfv.normal
        dot = jnp.einsum("qk,qk->q", nf, nw)
        # boundary length scale: the reference's 2*sdet analog — the local
        # face measure (wdA summed over the face ~ face length)
        L = jnp.sum(sfv.wdA) * jnp.ones_like(F)
        u = sfv.val["velocity"]
        un = jnp.einsum("qk,qk->q", u, nw)
        mis = un - self.v_attach * delta(F, eps) * dot ** 4 * L
        phi = sfv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, nw, phi)


class LSWallAngle(FaceKernel):
    """LS_WALL_ANGLE: penalty-strong grad(F) . n_wall = cos(theta) on the
    FILL rows (theta measured between the fill gradient — the into-phase-2
    interface normal — and the outward wall normal; exact for a
    signed-distance F)."""

    def __init__(self, angle_deg: float, penalty: float = 1e3,
                 normalize: bool = False):
        super().__init__(FILL_VAR, 1)
        self.cos_t = float(np.cos(np.deg2rad(angle_deg)))
        self.penalty = penalty
        # the reference uses the RAW gradient (signed-distance assumption);
        # normalize=True divides by |grad F| for non-SD fill fields
        self.normalize = normalize

    def residual(self, sfv, mat, params):
        gF = sfv.grad[FILL_VAR][:, 0, :]
        if self.normalize:
            gF = gF / jnp.maximum(
                jnp.linalg.norm(gF, axis=1, keepdims=True), 1e-30)
        mis = jnp.einsum("qk,qk->q", gF, sfv.normal) - self.cos_t
        phi = sfv.phi[FILL_VAR]
        return (self.penalty * mis[:, None] * phi)[:, None, :]


class LSCurvatureWallAngle(FaceKernel):
    """LS_CA_H: wall boundary term of the curvature projection equation
    with a prescribed contact angle — func = +cos(CA) replaces the natural
    -(n_F . n_wall) term (register INSTEAD of LSCurvatureBoundary on
    contact-line walls)."""

    def __init__(self, angle_deg: float, var: str = "ls_curvature"):
        super().__init__(var, 1)
        self.var = var
        self.cos_ca = float(np.cos(np.deg2rad(angle_deg)))

    def residual(self, sfv, mat, params):
        phi = sfv.phi[self.var]
        c = self.cos_ca * jnp.ones_like(sfv.val[self.var][:, 0])
        return (c[:, None] * phi)[:, None, :]


def melting_isotherm(T_melt: float, mesh_ncomp: int):
    """g(q, X, params) for the DISTNG family: q is the concatenation
    [mesh_displacement (mesh_ncomp,), temperature (1,)] at the node; the
    residual is T - T_melt (fTmelting, src/bc_colloc.c)."""

    def g(q, X, params):
        return q[mesh_ncomp] - T_melt

    return g


def add_distng(problem, nodes, T_melt: float, comp: int, dim: int):
    """Register DXDISTNG/DYDISTNG/DZDISTNG on ``nodes``: replace mesh
    displacement row ``comp`` with T - T_melt = 0 so the mesh boundary
    tracks the melting isotherm (src/bc_colloc.c:301)."""
    problem.add_point_constraint(
        nodes, ["mesh_displacement", "temperature"], comp,
        melting_isotherm(T_melt, dim))
