"""Interfacial matching conditions between discontinuous variables.

Parity: reference ``src/mm_interface.c`` (``interface_source:76-132``) and
the VL_EQUIL / Henry-law partitioning BCs: at a material interface where a
variable is discontinuous (see goma_tpu.mesh.interface.split_interface), a
surface exchange term ties the two sides together — flux continuity is
automatic (equal and opposite contributions), and the exchange law sets the
jump.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import InterfaceKernel


class InterfaceExchange(InterfaceKernel):
    """Surface exchange flux q_n = coeff * (u_a - K * u_b) leaving side A
    into side B (per component ``comp`` of ``var``).

    - finite ``coeff``: contact resistance / mass-transfer coefficient
      (temperature jump q/h, reference T_CONTACT_RESIS);
    - large ``coeff``: penalty enforcement of the partition equilibrium
      u_a = K u_b (Henry law / VL_EQUIL) with exact flux conservation.
    """

    def __init__(self, var: str, coeff: float, K: float = 1.0, ncomp: int = 1,
                 comp: int | None = None):
        super().__init__(var, ncomp)
        self.coeff = coeff
        self.K = K
        self.comp = comp

    def residual(self, sa, sb, mat_a, mat_b, params):
        ua = sa.val[self.var]  # (nq, ncomp)
        ub = sb.val[self.var]
        q = self.coeff * (ua - self.K * ub)
        if self.comp is not None:
            mask = jnp.zeros((1, ua.shape[1])).at[0, self.comp].set(1.0)
            q = q * mask
        ca = jnp.einsum("qc,qi->qci", q, sa.phi[self.var])
        cb = -jnp.einsum("qc,qi->qci", q, sb.phi[self.var])
        return ca, cb
