"""Exact-solution / crafted-state tests for the round-4 closing BC batch:
YFLUX_SUS (suspension hydro flux), POROUS_CONV (deforming-porous convective
mass transfer), VN_POROUS (gas-generation normal velocity).

Reference: src/mm_fill_species.c:6706 sus_mass_flux_surf_bc,
src/mm_fill_porous.c:3984 porous_convection_bc,
src/mm_fill_porous.c:4124 porous_normal_velocity_bc.
"""

import jax.numpy as jnp
import numpy as np

from goma_tpu.fem import Problem
from goma_tpu.fem.equations import PassiveVar
from goma_tpu.mesh import rectangle_mesh


def _row_sum(prob, prob0, x0, var, comp=0):
    dR = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params())) - \
        np.asarray(prob0.residual(jnp.asarray(x0), prob0.base_params()))
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar(var, comp)]
    return dR[d[d >= 0]].sum()


def test_suspension_flux_crafted():
    """YFLUX_SUS: at constant Y and a linear projected shear rate, the
    kernel's species-row sum is exactly rho * (N.n) * |face| with
    N = -Kc a^2 Y^2 grad(gd) (the collision term; grad Y = 0 kills the
    viscosity-gradient term)."""
    from goma_tpu.physics.species_flux import HydroSpecies, SuspensionFlux

    Kc, Kmu, a, Y0, g1, rho = 0.41, 0.62, 0.8, 0.3, 2.5, 1.7
    mesh = rectangle_mesh(5, 4, elem="QUAD4")
    hydro = HydroSpecies(Kc=Kc, Kmu=Kmu, a_rad=a, interp="Q1",
                         transient=False, convection=False)
    eqs = [hydro, PassiveVar("shear_rate", 1, "Q1")]
    mats = {"rho": rho}

    def build(with_bc):
        prob = Problem(mesh, list(eqs), dict(mats))
        if with_bc:
            prob.add_face_kernel("right", SuspensionFlux(hydro, rho=rho))
        prob.finalize()
        return prob

    prob, prob0 = build(True), build(False)
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "species", 0, Y0)
    x0 = prob.set_nodal_field(x0, "shear_rate", 0,
                              g1 * mesh.coords[:, 0])
    got = _row_sum(prob, prob0, x0, "species")
    # right face: n = (1, 0); N.n = -Kc a^2 Y0^2 g1; face length = 1
    want = rho * (-Kc * a * a * Y0 * Y0 * g1) * 1.0
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_porous_convection_crafted():
    """POROUS_CONV: prescribed solid convection velocity — the porous-row
    sum is +rho v.n |face| (saturated) and -rho_bulk v.n |face|
    (unsaturated), matching porous_convection_bc's two branches."""
    from goma_tpu.bc.porous_leak import PorousConvection
    from goma_tpu.physics.porous import POR_VAR, PorousFlow

    v = (0.4, 1.3)
    rho, rho_b = 2.2, 0.9
    mesh = rectangle_mesh(4, 4, elem="QUAD4")

    def build(kern):
        prob = Problem(mesh, [PorousFlow(transient=False)],
                       {"rho": rho, "bulk_density": rho_b,
                        "solid_convection": v,
                        "porous_mobility": 1.0})
        if kern is not None:
            prob.add_face_kernel("top", kern)
        prob.finalize()
        return prob

    x0 = np.zeros(build(None).dofmap.n_dof)
    got_s = _row_sum(build(PorousConvection(saturated=True)), build(None),
                     x0, POR_VAR)
    got_u = _row_sum(build(PorousConvection(saturated=False)), build(None),
                     x0, POR_VAR)
    # top face: n = (0, 1), v.n = 1.3, |face| = 1
    np.testing.assert_allclose(got_s, rho * v[1], rtol=1e-12)
    np.testing.assert_allclose(got_u, -rho_b * v[1], rtol=1e-12)


def test_vn_porous_gas_generation():
    """VN_POROUS: the Darcy rel-mass-flux leak closure feeds VNormLeak —
    at a crafted linear p_liq and zero velocity the x-momentum row sum is
    -penalty * leak * |face| with leak = -rho_l (k/mu) dp/dx / dens_vap."""
    from goma_tpu.bc.porous_leak import VNormLeak, porous_gas_gen_leak
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.physics.porous import POR_VAR

    kmu, rho_l, dens_vap, dpdx, pen = 0.7, 1.4, 0.05, 3.0, 1e4
    mesh = rectangle_mesh(4, 4, elem="QUAD9")

    def build(with_bc):
        prob = Problem(
            mesh,
            [Momentum(dim=2, interp="Q2", transient=False),
             Continuity(interp="Q1"), PassiveVar(POR_VAR, 1, "Q2")],
            {"rho": 1.0, "mu": 1.0, "k_over_mu": kmu, "rho_liq": rho_l})
        if with_bc:
            prob.add_face_kernel(
                "right",
                VNormLeak(dim=2, leak=porous_gas_gen_leak(dens_vap),
                          penalty=pen))
        prob.finalize()
        return prob

    prob, prob0 = build(True), build(False)
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, POR_VAR, 0, dpdx * mesh.coords[:, 0])
    got = _row_sum(prob, prob0, x0, "velocity", comp=0)
    leak = -rho_l * kmu * dpdx / dens_vap
    np.testing.assert_allclose(got, -pen * leak, rtol=1e-12)
