"""Surface-domain coupling BCs: mass transfer and Stefan flow at internal
surfaces between volumetric domains.

Parity: reference ``src/bc_surfacedomain.c`` (``mass_flux_sd_bc:44`` — surface
mass transfer between volumetric domains with a convective contribution) and
the SURFDOMAINCHEMKIN (SDC_*) boundary-condition family dispatched from
``src/bc_integ.c:1192-1247``: ``SDC_STEFANFLOW`` / ``SDC_KIN_SF`` implemented
by ``sdc_stefan_flow`` (``src/mm_ns_bc.c:1006``) — the strong integrated
condition on the normal momentum row

    n . rho (v - xdot) + sum_k W_k S_k = 0

linking the net interfacial mass production of surface reactions to the
induced normal (Stefan) flow — and ``SDC_KIN_SFV`` (``sdc_stefan_volume_flow``)
which constrains the *volume* flow ``n.(v - xdot) + sum_k V_k S_k = 0``.

In the reference these apply at CROSS_PHASE_DISCONTINUOUS internal surfaces
(one-sided, the applied side picked by ``BC_Data_Int[0]``; ``bc_integ.c:1197``).
Here the discontinuous-variable machinery is :mod:`goma_tpu.mesh.interface`
(node splitting + paired-face kernels); the mass-transfer exchange is a
two-sided conservative :class:`~goma_tpu.fem.equations.InterfaceKernel`, and
the Stefan-flow closures are one-sided face kernels appliable either on the
A-side faces of a split interface or on an ordinary sideset.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import FaceKernel, InterfaceKernel
from goma_tpu.physics.materials import prop


def _conv_normal(sfv, dim):
    """n.(v - xdot) at face quadrature points: ALE convective velocity
    (reference ``get_convection_velocity``, used by ``mass_flux_sd_bc``
    ``src/bc_surfacedomain.c:101``)."""
    n = sfv.normal
    if "velocity" in sfv.val:
        v = sfv.val["velocity"][:, :dim]
    else:
        v = jnp.zeros_like(sfv.x)
    if "mesh_displacement" in sfv.dot:
        v = v - sfv.dot["mesh_displacement"][:, :dim]
    return jnp.einsum("qk,qk->q", n, v)


class SurfDomainMassFlux(InterfaceKernel):
    """``mass_flux_sd_bc`` (``src/bc_surfacedomain.c:44``): mass-transfer flux
    of species ``comp`` across an internal surface between two volumetric
    domains,

        q_n(A->B) = mtc (Y_A - Y_c) + Y_A n.(v - xdot)

    i.e. a mass-transfer-coefficient driving force toward the equilibrium
    concentration ``Y_c`` plus the convective carry-through (the reference's
    ``Y_w * vconv . snormal`` term). Added conservatively: +q on the A-side
    species equation, -q on the B side (set ``two_sided=False`` for the
    reference's literal one-sided application)."""

    def __init__(self, mtc: float, Y_c: float, comp: int = 0,
                 ncomp: int = 1, two_sided: bool = True,
                 var: str = "species"):
        super().__init__(var, ncomp)
        self.mtc, self.Y_c, self.comp = mtc, Y_c, comp
        self.two_sided = two_sided

    def residual(self, sa, sb, mat_a, mat_b, params):
        Ya = sa.val[self.var][:, self.comp]
        dim = sa.x.shape[1]
        q = self.mtc * (Ya - self.Y_c) + Ya * _conv_normal(sa, dim)
        nq = sa.x.shape[0]
        pa, pb = sa.phi[self.var], sb.phi[self.var]
        ca = jnp.zeros((nq, self.ncomp, pa.shape[1]), dtype=pa.dtype)
        cb = jnp.zeros((nq, self.ncomp, pb.shape[1]), dtype=pb.dtype)
        ca = ca.at[:, self.comp, :].set(q[:, None] * pa)
        if self.two_sided:
            cb = cb.at[:, self.comp, :].set(-q[:, None] * pb)
        return ca, cb


class SDCStefanFlow(FaceKernel):
    """``SDC_STEFANFLOW`` / ``SDC_KIN_SF`` (``src/mm_ns_bc.c:1006``
    ``sdc_stefan_flow``; dispatch ``src/bc_integ.c:1192,1211``): strong
    integrated closure on the normal momentum row,

        penalty * phi_i n_a [ n . rho (v - xdot) + sum_k W_k S_k ] = 0,

    tying the normal mass flux through a reacting surface to the net mass
    production of the surface reactions (Stefan flow). ``rates(sfv, mat,
    params) -> (nq, nspec)`` returns molar surface reaction rates S_k
    (production of gas-phase species positive into this side);
    ``mol_weights`` are W_k. STRONG_INT_SURF in the reference = penalty
    replacement of the rotated normal-momentum row; here the same condition
    enters as a large-penalty weak term on the velocity equation."""

    def __init__(self, dim: int, mol_weights, rates, penalty: float = 1e6):
        super().__init__("velocity", dim)
        self.dim = dim
        self.mw = jnp.asarray(mol_weights, dtype=jnp.float64)
        self.rates = rates
        self.penalty = penalty

    def residual(self, sfv, mat, params):
        nq = sfv.x.shape[0]
        n = sfv.normal
        rho = prop(mat, "rho", sfv, params, 1.0)
        rho = rho if jnp.ndim(rho) else jnp.full((nq,), rho)
        S = self.rates(sfv, mat, params)  # (nq, nspec)
        src = jnp.einsum("qk,k->q", S, self.mw)
        f = rho * _conv_normal(sfv, self.dim) + src
        phi = sfv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", f, n, phi)


class SDCStefanVolumeFlow(SDCStefanFlow):
    """``SDC_KIN_SFV`` (``sdc_stefan_volume_flow``, ``src/bc_integ.c:1230``):
    volume-flow variant — n.(v - xdot) + sum_k V_k S_k = 0 with partial
    molar volumes ``V_k`` in place of W_k/rho."""

    def residual(self, sfv, mat, params):
        n = sfv.normal
        S = self.rates(sfv, mat, params)
        src = jnp.einsum("qk,k->q", S, self.mw)  # mw slot holds V_k here
        f = _conv_normal(sfv, self.dim) + src
        phi = sfv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", f, n, phi)
