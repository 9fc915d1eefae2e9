"""Nickel electroplating surface kinetics (YFLUX_NI / CURRENT_NI,
src/mm_fill_species.c:2652 mass_flux_surf_NI): fitted four-reaction system;
exact closure values and a diffusion-limited deposition balance."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import brentq

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Potential, Species
from goma_tpu.physics.electro import NickelPlatingFlux
from goma_tpu.solvers import NewtonOptions, NewtonSolver

F, R = 96487.0, 8.314


def _Q4(x_ni, ct, PHI_E, Phi_S, T):
    FRT = F / (R * T)
    d = 2 * FRT * (PHI_E - Phi_S + 0.2363)
    return (1.07e-05 / (2 * F)) * (
        np.exp(-0.21 * d) * ct * x_ni / 0.001 - np.exp(0.79 * d))


def test_ni_deposition_diffusion_balance():
    """1D strip: Ni2+ diffuses from the bulk (left Dirichlet) to the
    cathode (right, NickelPlatingFlux); steady surface mole fraction solves
    D (x_b - x_s)/L = Q4(x_s) exactly."""
    D, L = 1e-4, 1.0
    x_bulk, ct = 0.05, 55.0
    PHI_E, T = -0.45, 298.15
    mesh = rectangle_mesh(10, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.2))
    eqs = [Species(5, interp="Q2", transient=False, convection=False),
           Potential()]
    prob = Problem(mesh, eqs, {"diffusivity": D})
    for comp, val in ((0, x_bulk), (1, 0.9), (2, 1e-3), (3, 1e-3), (4, 1e-3)):
        prob.add_dirichlet("left", "species", comp, val)
    prob.add_dirichlet("left", "voltage", 0, 0.0)
    prob.add_dirichlet("right", "voltage", 0, 0.0)
    prob.add_face_kernel("right", NickelPlatingFlux(
        mode=0, PHI_E=PHI_E, T=T, c_total=ct, ncomp=5))
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    for comp, val in ((0, x_bulk), (1, 0.9), (2, 1e-3), (3, 1e-3), (4, 1e-3)):
        x0 = prob.set_nodal_field(x0, "species", comp, val)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=25, tol_residual=1e-12, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "species", 0)
    xs = c[np.isclose(mesh.coords[:, 0], L)].mean()
    # exact surface fraction from the flux balance
    xs_ex = brentq(lambda x: D * (x_bulk - x) / L - _Q4(x, ct, PHI_E, 0.0, T),
                   0.0, x_bulk)
    np.testing.assert_allclose(xs, xs_ex, rtol=1e-6)
    # the profile is linear (constant flux)
    mid = c[np.isclose(mesh.coords[:, 0], 0.5)].mean()
    np.testing.assert_allclose(mid, 0.5 * (x_bulk + xs), rtol=1e-6)


def test_ni_current_mode_total():
    """CURRENT_NI: the potential-row flux equals the electron-weighted sum
    Q1 + Q2 + 2 Q3 + 2 Q4 of the four reactions at the boundary state."""
    ct, PHI_E, T = 55.0, -0.3, 298.15
    x_state = dict(ni=0.04, h=2e-3, oh=1e-3, nioh=5e-4)
    mesh = rectangle_mesh(4, 2, elem="QUAD9")
    eqs = [Species(5, interp="Q2", transient=False, convection=False),
           Potential()]
    prob = Problem(mesh, eqs, {"diffusivity": 1.0})
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    for comp, val in ((0, x_state["ni"]), (1, 0.95), (2, x_state["h"]),
                      (3, x_state["oh"]), (4, x_state["nioh"])):
        prob.add_dirichlet("all", "species", comp, val)
    # keep the electrode-edge voltage rows free so the raw kernel
    # contribution is visible in the residual
    c = mesh.coords
    nr = np.where(c[:, 0] < 1.0 - 1e-9)[0].astype(np.int32)
    mesh.nodesets["notright"] = nr
    prob.add_dirichlet("notright", "voltage", 0, 0.0)
    prob.add_face_kernel("right", NickelPlatingFlux(
        mode="current", PHI_E=PHI_E, T=T, c_total=ct, ncomp=5))
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    for comp, val in ((0, x_state["ni"]), (1, 0.95), (2, x_state["h"]),
                      (3, x_state["oh"]), (4, x_state["nioh"])):
        x0 = prob.set_nodal_field(x0, "species", comp, val)
    x0 = prob.set_nodal_field(x0, "voltage", 0, 0.0)
    R_vec = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params()))
    dm = prob.dofmap
    dv = dm.dof_of_node_svar[:, dm.svar("voltage", 0)]
    tot = R_vec[dv[dv >= 0]].sum()  # int of current over the right face
    FRT = F / (R * T)
    d1 = FRT * (PHI_E - 0.0)
    Q1 = (0.289 / F) * np.exp(-0.11 * d1) * ct * x_state["h"] / 0.001
    d2 = FRT * (PHI_E + 0.8280)
    Q2 = (8.80e-09 / F) * np.exp(-0.4 * d2)
    d3 = 2 * FRT * (PHI_E + 0.3648)
    Q3 = (1.34 / (2 * F)) * (ct / 0.001) * (
        np.exp(-0.33 * d3) * x_state["nioh"] - np.exp(0.67 * d3)
        * x_state["oh"])
    Q4 = _Q4(x_state["ni"], ct, PHI_E, 0.0, T)
    i_exact = Q1 + Q2 + 2 * Q3 + 2 * Q4
    # face length = 1.0 (unit square right edge): integral = i_exact
    np.testing.assert_allclose(tot, i_exact, rtol=1e-9)


def test_current_sic_linear_conductor():
    """CURRENT_SIC: pinning the end current i0 on a 1D conductor with
    V(0)=V0 gives the exact linear potential slope -i0/perm."""
    from goma_tpu.physics.electro import CurrentSIC

    V0, i0, perm, L = 2.0, 0.6, 1.5, 1.0
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.2))
    prob = Problem(mesh, [Potential()], {"permittivity": perm})
    prob.add_dirichlet("left", "voltage", 0, V0)
    prob.add_face_kernel("right", CurrentSIC(i_app=i0, perm=perm))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=5, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    V = prob.get_nodal_field(res.x, "voltage", 0)
    c = mesh.coords
    m = np.isfinite(V)  # voltage is Q1: midside nodes carry no dof
    np.testing.assert_allclose(V[m], V0 - (i0 / perm) * c[m, 0], atol=1e-6)


def test_alloy_evaporation_flux():
    """YFLUX_ALLOY: the cubic-in-T evaporation coefficient, checked against
    the closed form on a strip with a linear temperature field."""
    from goma_tpu.physics.electro import AlloyEvapFlux
    from goma_tpu.physics import Energy

    Tm, c0, c1, c2, c3 = 1.0, -2.0, 1.3, 0.4, 0.05
    y_inf, D = 0.1, 1.0
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.2))
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Species(1, interp="Q2", transient=False, convection=False),
           Energy(interp="Q2", transient=False, convection=False)]
    prob = Problem(mesh, eqs, {"diffusivity": D, "rho": 1, "Cp": 1, "k": 1})
    prob.add_dirichlet("all", "temperature", 0, lambda c: 1.0 + 0.5 * c[:, 0])
    prob.add_dirichlet("left", "species", 0, 0.8)
    prob.add_face_kernel("right", AlloyEvapFlux(Tm, c0, c1, c2, c3, y_inf))
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, 0.8)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-12, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    y = prob.get_nodal_field(res.x, "species", 0)
    ys = y[np.isclose(mesh.coords[:, 0], 1.0)].mean()
    dT = 1.5 - Tm
    k = np.exp(c0 + c1 * dT - c2 * dT**2 + c3 * dT**3)
    # flux balance: D (0.8 - ys)/L = k (ys - y_inf)
    ys_ex = (D * 0.8 + k * y_inf) / (D + k)
    np.testing.assert_allclose(ys, ys_ex, rtol=1e-7)


def test_surface_charge_constraint():
    """SURFACE_CHARGE: the strong boundary constraint sum z_i c_i = sigma
    replaces a species row at boundary nodes (electroneutral sigma=0)."""
    from goma_tpu.physics.electro import surface_charge_constraint

    z = (1.0, -2.0)
    mesh = rectangle_mesh(6, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.2))
    prob = Problem(mesh, [Species(2, interp="Q2", transient=False,
                                  convection=False)],
                   {"diffusivity": 1.0})
    prob.add_dirichlet("left", "species", 0, 0.4)
    prob.add_dirichlet("left", "species", 1, 0.1)
    rn = mesh.nodesets["right"]
    prob.add_point_constraint("right", "species", 1,
                              surface_charge_constraint(z, 0.0, 1))
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "species", 0, 0.4)
    x0 = prob.set_nodal_field(x0, "species", 1, 0.1)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=8, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    c0 = prob.get_nodal_field(res.x, "species", 0)
    c1 = prob.get_nodal_field(res.x, "species", 1)
    np.testing.assert_allclose(z[0] * c0[rn] + z[1] * c1[rn], 0.0,
                               atol=1e-10)


def test_electrodeposition_velocity_closure():
    """KIN/VNORM_ELECTRODEPOSITION: the interface velocity closure equals
    Vmolar (Q_Ni + Q_NiOH) at a prescribed state (drives KinematicBC's
    leak / the normal-velocity penalty)."""
    from goma_tpu.physics.electro import electrodeposition_velocity
    import jax.numpy as jnp

    ct, PHI_E, T, Vm = 55.0, -0.4, 298.15, 6.59
    x_ni, x_h, x_oh, x_nioh = 0.03, 1e-3, 2e-3, 8e-4

    class SFV:
        pass

    sfv = SFV()
    sfv.x = jnp.zeros((3, 2))
    sfv.val = {"species": jnp.tile(jnp.array(
        [[x_ni, 0.95, x_h, x_oh, x_nioh]]), (3, 1)),
        "voltage": jnp.zeros((3, 1))}
    v = electrodeposition_velocity(PHI_E, T, Vm, c_total=ct)(sfv, {}, {})
    FRT = F / (R * T)
    d3 = 2 * FRT * (PHI_E + 0.3648)
    Q3 = (1.34 / (2 * F)) * (ct / 0.001) * (
        np.exp(-0.33 * d3) * x_nioh - np.exp(0.67 * d3) * x_oh)
    Q4 = _Q4(x_ni, ct, PHI_E, 0.0, T)
    np.testing.assert_allclose(np.asarray(v), Vm * (Q3 + Q4), rtol=1e-12)


def test_species_kinematic_flux_balance():
    """KINEMATIC_SPECIES: with an imposed boundary suction velocity v_n,
    the steady profile satisfies D (Y_b - Y_s)/L = rho Y_s v_n exactly."""
    from goma_tpu.bc import SpeciesKinematicFlux
    from goma_tpu.fem.equations import PassiveVar

    D, L, Yb, vn = 0.5, 1.0, 0.3, 0.8
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, L), ylim=(0, 0.2))
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Species(1, interp="Q2", transient=False, convection=False),
           PassiveVar("velocity", 2, "Q2")]
    prob = Problem(mesh, eqs, {"diffusivity": D, "rho": 1.0})
    prob.add_dirichlet("left", "species", 0, Yb)
    prob.add_dirichlet("all", "velocity", 0, vn)
    prob.add_dirichlet("all", "velocity", 1, 0.0)
    prob.add_face_kernel("right", SpeciesKinematicFlux())
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, Yb)
    x0 = prob.set_nodal_field(x0, "velocity", 0, vn)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    Y = prob.get_nodal_field(res.x, "species", 0)
    Ys = Y[np.isclose(mesh.coords[:, 0], L)].mean()
    Ys_ex = D * Yb / (D + vn * L)
    np.testing.assert_allclose(Ys, Ys_ex, rtol=1e-8)


def test_pem_water_flux_values():
    """YFLUX_H2O_ANODE/CATHODE: crafted-state row sums equal the verbatim
    transcriptions of the reference closures."""
    from goma_tpu.physics.electro import PEMWaterFlux
    from goma_tpu.fem.equations import PassiveVar
    import jax.numpy as jnp

    ai0, Ha, cref, aa, ac, T, U0, nd, V = (
        1.2e3, 1e-3, 4e-5, 0.5, 0.5, 353.0, 0.0, 1.2, 0.7)
    c0, phi0 = 2.5e-5, 0.12
    for side in ("anode", "cathode"):
        mesh = rectangle_mesh(4, 2, elem="QUAD9")
        mesh.nodesets["alln"] = np.arange(mesh.n_nodes, dtype=np.int32)
        nr = np.where(mesh.coords[:, 0] < 1.0 - 1e-9)[0].astype(np.int32)
        mesh.nodesets["notright"] = nr
        eqs = [Species(1, interp="Q2", transient=False, convection=False),
               PassiveVar("voltage", 1, "Q2", reg=1e-10)]
        prob = Problem(mesh, eqs, {"diffusivity": 1.0})
        prob.add_dirichlet("notright", "species", 0, c0)
        prob.add_dirichlet("alln", "voltage", 0, phi0)
        prob.add_face_kernel("right", PEMWaterFlux(
            side, ai0, Ha, cref, aa, ac, T, U0, nd, V=V))
        prob.finalize()
        prob0 = Problem(mesh, eqs, {"diffusivity": 1.0})
        prob0.add_dirichlet("notright", "species", 0, c0)
        prob0.add_dirichlet("alln", "voltage", 0, phi0)
        prob0.finalize()
        x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                                  "species", 0, c0)
        x0 = prob.set_nodal_field(x0, "voltage", 0, phi0)
        dR = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params())) \
            - np.asarray(prob0.residual(jnp.asarray(x0),
                                        prob0.base_params()))
        dm = prob.dofmap
        dS = dm.dof_of_node_svar[:, dm.svar("species", 0)]
        tot = dR[dS[dS >= 0]].sum()
        if side == "anode":
            q = -ai0 * Ha * np.sqrt(c0 / cref) * 0.5 * (aa + ac) \
                * (phi0 + U0) / (8.314 * T) * nd
        else:
            grp = ac * 96487.0 / (8.314 * T) * (V - phi0 - U0)
            q = -(nd + 2.0) * (ai0 * Ha / (4 * 96487.0)) * (c0 / cref) \
                * np.exp(-grp)
        np.testing.assert_allclose(tot, -q, rtol=1e-10, err_msg=side)


def test_koh_etch_flux_values():
    """YFLUX_ETCH: crafted-state row sums reproduce the Seidel-law fluxes
    with the reference stoichiometry exactly."""
    from goma_tpu.physics.species_flux import (KOHSiEtchFlux,
                                               koh_si_etch_rate_100)
    import jax.numpy as jnp

    T = 353.0
    rho_H2O, rho_KOH = 0.9, 5e-4  # above the gate
    mesh = rectangle_mesh(4, 2, elem="QUAD9")
    nr = np.where(mesh.coords[:, 0] < 1.0 - 1e-9)[0].astype(np.int32)
    mesh.nodesets["nr2"] = nr
    mesh.nodesets["alln2"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Species(4, interp="Q2", transient=False, convection=False)]
    vals = (rho_H2O, rho_KOH, 1e-5, 1e-5)

    def build(with_kernel, comp):
        p = Problem(mesh, eqs, {"diffusivity": 1.0})
        for k, v in enumerate(vals):
            p.add_dirichlet("nr2", "species", k, v)
        if with_kernel:
            p.add_face_kernel("right", KOHSiEtchFlux(comp, T))
        p.finalize()
        x0 = np.zeros(p.dofmap.n_dof)
        for k, v in enumerate(vals):
            x0 = p.set_nodal_field(x0, "species", k, v)
        return np.asarray(p.residual(jnp.asarray(x0), p.base_params())), p

    R_rate = float(koh_si_etch_rate_100(jnp.asarray(rho_H2O),
                                        jnp.asarray(rho_KOH), T))
    rho_si, mw_si = 2.3290, 28.0855
    mws = (18.01528, 17.008, 2 * 1.00794, 28.0855 + 2*15.9994 + 2*17.008)
    st = (2.0, 2.0, -2.0, -1.0)
    for comp in range(4):
        R1, p1 = build(True, comp)
        R0, _ = build(False, comp)
        dm = p1.dofmap
        dS = dm.dof_of_node_svar[:, dm.svar("species", comp)]
        tot = (R1 - R0)[dS[dS >= 0]].sum()
        q = st[comp] * rho_si / mw_si * mws[comp] * R_rate
        np.testing.assert_allclose(tot, q, rtol=1e-10, err_msg=str(comp))


def test_charged_surface_gradient_pin():
    """FICK_CHRGD_SURF_GRAD: the penalty drives the total charged-Fickian
    normal flux to the prescribed value; with migration from a linear V
    the converged gradient satisfies -D(dc/dn) - D z c FRT dV/dn = q0."""
    from goma_tpu.physics.species_flux import ChargedSurfaceGradient
    from goma_tpu.fem.equations import PassiveVar
    import jax.numpy as jnp

    D, z, T, q0, dVdx = 0.5, 2.0, 298.15, 0.01, -0.002
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.2))
    mesh.nodesets["all3"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Species(1, interp="Q2", transient=False, convection=False),
           PassiveVar("voltage", 1, "Q2", reg=1e-10)]
    prob = Problem(mesh, eqs, {"diffusivity": D})
    prob.add_dirichlet("left", "species", 0, 0.3)
    prob.add_dirichlet("all3", "voltage", 0, lambda c: dVdx * c[:, 0])
    prob.add_face_kernel("right", ChargedSurfaceGradient(
        value=q0, z=z, T=T, penalty=1e6))
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, 0.3)
    x0 = prob.set_nodal_field(x0, "voltage", 0,
                              dVdx * mesh.coords[:, 0])
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "species", 0)
    xs = mesh.coords[:, 0]
    # linear-ish c(x): evaluate dc/dn at the right face by one-sided FD on
    # the Q2 nodal line, then check the imposed flux identity
    row = np.isclose(mesh.coords[:, 1], 0.1)
    o = np.argsort(xs[row])
    cr, xr = c[row][o], xs[row][o]
    dcdx = (3*cr[-1] - 4*cr[-2] + cr[-3]) / (xr[-1] - xr[-3])
    FRT = 96487.0 / (8.314 * T)
    flux = -D * dcdx - D * z * cr[-1] * FRT * dVdx
    np.testing.assert_allclose(flux, q0, rtol=5e-4)
