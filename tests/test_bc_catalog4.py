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


def _fake_edge(nq=4, dim=3, xdot=None):
    """Crafted contact-curve state for CAEdge-family kernels."""
    import types

    from goma_tpu.fem.fields import MESH_VAR

    rng = np.random.default_rng(7)
    nfs = rng.normal(size=(nq, dim))
    nfs /= np.linalg.norm(nfs, axis=1, keepdims=True)
    nss = rng.normal(size=(nq, dim))
    nss /= np.linalg.norm(nss, axis=1, keepdims=True)
    efv = types.SimpleNamespace()
    efv.x = jnp.asarray(rng.normal(size=(nq, dim)))
    efv.normal_a = jnp.asarray(nfs)
    efv.normal_b = jnp.asarray(nss)
    efv.tangent = jnp.asarray(np.cross(nfs, nss))
    efv.phi = {MESH_VAR: jnp.asarray(rng.normal(size=(nq, 6))),
               "velocity": jnp.asarray(rng.normal(size=(nq, 6)))}
    efv.dot = {}
    if xdot is not None:
        efv.dot[MESH_VAR] = jnp.asarray(
            np.broadcast_to(np.asarray(xdot, dtype=float), (nq, dim)))
    return efv


def test_moving_ca_edge_limits():
    """MOVING_CA: at zero contact-line speed the kernel is exactly the
    static CAEdge(theta_s); at large advancing speed the enforced angle
    saturates at theta_adv (tanh -> 1)."""
    from goma_tpu.bc.edge import CAEdge, MovingCAEdge

    th_s, th_adv, sc = np.deg2rad(60.0), np.deg2rad(120.0), 5.0
    efv0 = _fake_edge(xdot=(0.0, 0.0, 0.0))
    r_static = CAEdge(th_s).residual(efv0, {}, {})
    r_moving = MovingCAEdge(th_s, th_adv, sc).residual(efv0, {}, {})
    np.testing.assert_allclose(np.asarray(r_moving), np.asarray(r_static),
                               rtol=1e-12)
    # large advancing speed along +n_fs: v_rel >> 1/scaling
    efv_fast = _fake_edge(xdot=(0.0, 0.0, 0.0))
    efv_fast.dot = {list(efv0.dot)[0]: 100.0 * efv_fast.normal_a}
    r_fast = MovingCAEdge(th_s, th_adv, sc).residual(efv_fast, {}, {})
    r_adv = CAEdge(th_adv).residual(efv_fast, {}, {})
    np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_adv),
                               rtol=1e-9)
    # wall motion cancels the mesh motion -> static again
    efv_w = _fake_edge(xdot=(0.3, -0.2, 0.1))
    r_w = MovingCAEdge(th_s, th_adv, sc,
                       v_wall=(0.3, -0.2, 0.1)).residual(efv_w, {}, {})
    np.testing.assert_allclose(np.asarray(r_w),
                               np.asarray(CAEdge(th_s).residual(efv_w, {}, {})),
                               rtol=1e-12)


def test_ca_momentum_rows():
    """CA_MOMENTUM: the identical fapply_CA misfit lands on the momentum
    rows (velocity test functions) instead of the mesh rows."""
    from goma_tpu.bc.edge import CAEdge
    from goma_tpu.fem.fields import MESH_VAR

    th = np.deg2rad(45.0)
    efv = _fake_edge()
    r_mesh = np.asarray(CAEdge(th).residual(efv, {}, {}))
    r_mom = np.asarray(CAEdge(th, var="velocity").residual(efv, {}, {}))
    # same misfit * n_fs outer product, different test functions
    phi_m = np.asarray(efv.phi[MESH_VAR])
    phi_v = np.asarray(efv.phi["velocity"])
    np.testing.assert_allclose(
        r_mom, r_mesh / phi_m[:, None, :] * phi_v[:, None, :], rtol=1e-12)


def test_shell_lub_wall_resistance():
    """SHELL_LUB_WALL: at a crafted linear lub pressure on a 2D film
    domain, the side-wall resistance row sum is exactly
    W(n_pwr) * fudge * (q.t) * |face|, and the level-set gate scales it by
    (1 - H(F))."""
    from goma_tpu.physics.lubrication import LUB_VAR, ReynoldsFilm, ShellLubWall

    h, mu, dPdy, n_pwr, fudge = 0.3, 1.2, 2.0, 0.5, 0.7
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    mats = {"gap": h, "mu_lub": mu}

    def build(kern):
        prob = Problem(mesh, [ReynoldsFilm(interp="Q1")], dict(mats))
        if kern is not None:
            prob.add_face_kernel("right", kern)
        prob.finalize()
        return prob

    prob = build(ShellLubWall(pwr_index=n_pwr, fudge=fudge))
    prob0 = build(None)
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, LUB_VAR, 0, dPdy * mesh.coords[:, 1])
    got = _row_sum(prob, prob0, x0, LUB_VAR)
    W = -np.pi * (2 + 1 / n_pwr) / (3 + 1 / n_pwr) / 2 ** (2 + 1 / n_pwr) \
        * fudge
    q_t = -(h**3 / (12 * mu)) * dPdy  # q . (0, +-1): sign from tangent
    np.testing.assert_allclose(abs(got), abs(W * q_t), rtol=1e-12)


def test_tfmp_avg_plate_velo():
    """SHELL_TFMP_AVG_PLATE_VELO: the open-side liquid carry-out rows sum
    to exactly h * S * (n . v_avg) * |face|."""
    from goma_tpu.physics.lubrication import (TFMP_P, TFMP_S, TFMPAvgPlateVelo,
                                              TFMPBound, TFMPMass)

    h, S0, v_avg = 0.25, 0.6, (1.7, -0.4)
    mesh = rectangle_mesh(4, 3, elem="QUAD4")
    mats = {"gap": h, "mu_l": 1.0, "mu_g": 1.0, "wall_velocity": v_avg}

    def build(with_bc):
        prob = Problem(mesh, [TFMPMass(interp="Q1", transient=False),
                              TFMPBound(interp="Q1", transient=False)],
                       dict(mats))
        if with_bc:
            prob.add_face_kernel("right", TFMPAvgPlateVelo())
        prob.finalize()
        return prob

    prob, prob0 = build(True), build(False)
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, TFMP_S, 0, S0)
    got = _row_sum(prob, prob0, x0, TFMP_S)
    np.testing.assert_allclose(got, h * S0 * v_avg[0], rtol=1e-12)


def test_shell_coordinates_rows():
    """R_SHELL_X/R_SHELL_Y: on an equally spaced bar shell the equal-arc
    x-rows telescope to exactly zero at interior nodes, and with constant
    curvature K0 the y-rows carry exactly -penalty K0 dx per interior node
    (the discrete d2y/ds2 - K dx/ds closure at y = 0)."""
    from goma_tpu.fem.fields import MESH_VAR
    from goma_tpu.physics.shell import ShellCoordinates, attach_shell_block

    K0, pen = 1.7, 1e3
    nx = 6
    mesh = rectangle_mesh(nx, 2, elem="QUAD4")
    bi = attach_shell_block(mesh, "bottom", "shcoord")
    prob = Problem(mesh, [[], [ShellCoordinates(interp="Q1", penalty=pen),
                               PassiveVar("sh_K", 1, "Q1")]],
                   [{}, {}])
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "sh_K", 0, K0)
    R = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params()))
    dm = prob.dofmap
    dx = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 0)]
    dy = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 1)]
    sn = np.unique(mesh.blocks[bi].conn)
    xs = mesh.coords[sn, 0]
    interior = sn[(xs > 1e-9) & (xs < 1.0 - 1e-9)]
    h = 1.0 / nx
    np.testing.assert_allclose(R[dx[interior]], 0.0, atol=1e-12)
    np.testing.assert_allclose(R[dy[interior]], -pen * K0 * h, rtol=1e-12)


def test_shell_surf_curv_projection():
    """SH_GAMMA2 equation: with a registered normal field n = (a x, b) on a
    straight bar, div_s n = a exactly and the projection solves
    surf_curv = a at every node."""
    from goma_tpu.physics.shell import ShellSurfCurv, attach_shell_block
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    a = 2.3
    mesh = rectangle_mesh(5, 2, elem="QUAD4")
    bi = attach_shell_block(mesh, "bottom", "g2")
    prob = Problem(mesh, [[], [ShellSurfCurv(interp="Q1"),
                               PassiveVar("normal", 2, "Q1")]],
                   [{}, {}])
    sn = np.unique(mesh.blocks[bi].conn)
    mesh.nodesets["g2_nodes"] = sn.astype(np.int32)
    prob.add_dirichlet("g2_nodes", "normal", 0, lambda c: a * c[:, 0])
    prob.add_dirichlet("g2_nodes", "normal", 1, 0.4)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-12, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    kv = prob.get_nodal_field(res.x, "surf_curv", 0)
    np.testing.assert_allclose(kv[sn], a, rtol=1e-10)


def test_shell_diffusion_flux_and_kinematic():
    """SHELL_DIFF_FLUX + SHELL_DIFF_KINEMATIC: with Kd = c1 x the flux
    equation solves Js = +D c1 at interior nodes (the reference's weak
    orientation: Js phi + D Kd phi' = 0 IBPs to Js = +D dKd/ds; exact for
    a linear curvature field); the kinematic closure then loads the mesh
    rows with exactly penalty * (dJs/ds) * n."""
    from goma_tpu.fem.fields import MESH_VAR
    from goma_tpu.physics.shell import (SH_J, ShellDiffKinematic,
                                        ShellDiffusionFlux,
                                        attach_shell_block)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    c1, Ds, Gs, Va = 1.9, 0.7, 1.3, 0.5
    D = Ds * Gs * Va
    mesh = rectangle_mesh(6, 2, elem="QUAD4")
    bi = attach_shell_block(mesh, "bottom", "mull")
    prob = Problem(mesh, [[], [ShellDiffusionFlux(curv_var="surf_curv"),
                               PassiveVar("surf_curv", 1, "Q1")]],
                   [{}, {"surf_diff_Ds": Ds, "surf_energy_Gs": Gs,
                         "atomic_vol_Va": Va}])
    sn = np.unique(mesh.blocks[bi].conn)
    xs = mesh.coords[sn, 0]
    mesh.nodesets["mull_nodes"] = sn.astype(np.int32)
    mesh.nodesets["mull_ends"] = sn[
        (xs < 1e-9) | (xs > 1 - 1e-9)].astype(np.int32)
    prob.add_dirichlet("mull_nodes", "surf_curv", 0, lambda c: c1 * c[:, 0])
    prob.add_dirichlet("mull_ends", SH_J, 0, D * c1)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-12, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    Js = prob.get_nodal_field(res.x, SH_J, 0)
    np.testing.assert_allclose(Js[sn], D * c1, rtol=1e-10)

    # kinematic closure: Js = c1 x field, xdot = 0 -> mesh-y row sum
    # = penalty * (-dJs/ds) * n_y * |curve| = penalty * c1 (n_y = -1)
    pen = 1e4
    prob2 = Problem(mesh, [[], [ShellDiffKinematic(penalty=pen),
                                PassiveVar(SH_J, 1, "Q1")]],
                    [{}, {}])
    prob2.finalize()
    x0 = np.zeros(prob2.dofmap.n_dof)
    x0 = prob2.set_nodal_field(x0, SH_J, 0, c1 * mesh.coords[:, 0])
    R = np.asarray(prob2.residual(jnp.asarray(x0), prob2.base_params()))
    dm = prob2.dofmap
    dy = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 1)]
    dxc = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 0)]
    got_y = R[dy[dy >= 0]].sum()
    got_x = R[dxc[dxc >= 0]].sum()
    np.testing.assert_allclose(got_y, pen * c1, rtol=1e-12)
    np.testing.assert_allclose(got_x, 0.0, atol=1e-9 * pen)


def test_tie_fluid_shell_injection():
    """SH_FLUID_STRESS: the weighted row injection adds exactly
    n . (R_mom0, R_mom1) into the shell-curvature row and
    t . (R_mom0, R_mom1) into the shell-tension row at every shared
    node."""
    from goma_tpu.bc.rotation import nodal_normals
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.physics.shell import (ShellCurvature, ShellTension,
                                        attach_shell_block, tie_fluid_shell)

    scale = 0.8
    mesh = rectangle_mesh(4, 3, elem="QUAD4")
    bi = attach_shell_block(mesh, "bottom", "fsi_sh")
    sn = np.unique(mesh.blocks[bi].conn)
    mesh.nodesets["sh_nodes"] = sn.astype(np.int32)

    def build(tie):
        prob = Problem(
            mesh,
            [[Momentum(dim=2, interp="Q1", transient=False),
              Continuity(interp="P0")],
             [ShellCurvature(bend_stiffness=1.0, interp="Q1"),
              ShellTension(bend_stiffness=1.0, interp="Q1")]],
            [{"rho": 1.0, "mu": 1.0}, {}])
        if tie:
            tie_fluid_shell(prob, mesh, "sh_nodes", ("bottom",),
                            scale=scale)
        prob.finalize()
        return prob

    prob, prob0 = build(True), build(False)
    x0 = np.zeros(prob.dofmap.n_dof)
    rng = np.random.default_rng(3)
    for v, c in (("velocity", 0), ("velocity", 1), ("sh_K", 0),
                 ("sh_tens", 0)):
        x0 = prob.set_nodal_field(x0, v, c,
                                  rng.normal(size=mesh.n_nodes))
    R = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params()))
    R0 = np.asarray(prob0.residual(jnp.asarray(x0), prob0.base_params()))
    dm = prob.dofmap
    normals = nodal_normals(mesh, ("bottom",))
    for node in sn:
        n = normals[int(node)]
        t = np.array([-n[1], n[0]])
        rm = np.array([R0[dm.dof_of_node_svar[node, dm.svar("velocity", a)]]
                       for a in range(2)])
        dK = dm.dof_of_node_svar[node, dm.svar("sh_K", 0)]
        dT = dm.dof_of_node_svar[node, dm.svar("sh_tens", 0)]
        np.testing.assert_allclose(R[dK] - R0[dK], scale * n @ rm,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(R[dT] - R0[dT], scale * t @ rm,
                                   rtol=1e-10, atol=1e-12)


def test_shell_normal_and_angle_projection():
    """R_SHELL_NORMAL / R_SHELL_ANGLE: on the bottom boundary bar shell the
    solved normal projects to exactly (0, -1) and the angle to -pi/2."""
    from goma_tpu.physics.shell import (ShellAngle, ShellNormal,
                                        attach_shell_block)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(4, 3, elem="QUAD4")
    bi = attach_shell_block(mesh, "bottom", "shn")
    prob = Problem(mesh, [[], [ShellNormal(dim=2, interp="Q1"),
                               ShellAngle(dim=2, interp="Q1")]], [{}, {}])
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=3, tol_residual=1e-12, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    sn = np.unique(mesh.blocks[bi].conn)
    nxv = prob.get_nodal_field(res.x, "shell_normal", 0)
    nyv = prob.get_nodal_field(res.x, "shell_normal", 1)
    ang = prob.get_nodal_field(res.x, "shell_angle", 0)
    np.testing.assert_allclose(nxv[sn], 0.0, atol=1e-10)
    np.testing.assert_allclose(nyv[sn], -1.0, rtol=1e-10)
    np.testing.assert_allclose(ang[sn], -np.pi / 2, rtol=1e-10)


def test_shell_curvature_pair_projection():
    """R_SHELL_CURVATURE(+2): on a flat 3D surface shell with a registered
    linear normal field n = (a x, b y, c), the tangent-direction normal
    curvatures project to exactly (a, b)."""
    from goma_tpu.mesh.generators import box_mesh
    from goma_tpu.physics.shell import ShellCurvaturePair, attach_shell_block
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    a, b = 1.4, -0.6
    mesh = box_mesh(3, 3, 2, elem="HEX8")
    bi = attach_shell_block(mesh, "bottom", "shc3")
    prob = Problem(mesh, [[], [ShellCurvaturePair(interp="Q1"),
                               PassiveVar("shell_normal", 3, "Q1")]],
                   [{}, {}])
    sn = np.unique(mesh.blocks[bi].conn)
    mesh.nodesets["shc3_nodes"] = sn.astype(np.int32)
    prob.add_dirichlet("shc3_nodes", "shell_normal", 0,
                       lambda c: a * c[:, 0])
    prob.add_dirichlet("shc3_nodes", "shell_normal", 1,
                       lambda c: b * c[:, 1])
    prob.add_dirichlet("shc3_nodes", "shell_normal", 2, 1.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=3, tol_residual=1e-12, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    k0 = prob.get_nodal_field(res.x, "sh_K_pair", 0)
    k1 = prob.get_nodal_field(res.x, "sh_K_pair", 1)
    # tangent ordering on the face is mesh-convention dependent: the two
    # projected curvatures match {a, b} as an unordered pair at every node
    got = np.sort(np.stack([k0[sn], k1[sn]], axis=1), axis=1)
    want = np.broadcast_to(np.sort([a, b]), got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_strain_history_equations():
    """R_CUR_STRAIN / R_MAX_STRAIN: for d = (c x, 0) the von Mises strain
    is (2/3) sqrt(1.5 dev:dev) exactly; CurStrain projects it, and
    MaxStrain's selection keeps max(vmE, ms_old)."""
    from goma_tpu.physics.solid import (SOLID_VAR, CurStrain, MaxStrain,
                                        von_mises_strain)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    c = 0.3
    # linear strain E = diag(c, 0); full 3x3 dev -> dd = 2/3 c^2
    vm_exact = (2.0 / 3.0) * np.sqrt(1.5 * (2.0 / 3.0) * c * c)
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [CurStrain(interp="Q1"),
                          PassiveVar(SOLID_VAR, 2, "Q1")], {})
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    prob.add_dirichlet("all", SOLID_VAR, 0, lambda co: c * co[:, 0])
    prob.add_dirichlet("all", SOLID_VAR, 1, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=3, tol_residual=1e-13, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    cs = prob.get_nodal_field(res.x, "cur_strain", 0)
    np.testing.assert_allclose(cs, vm_exact, rtol=1e-10)

    # MaxStrain selection at a crafted state (steady: ms_old = ms)
    prob2 = Problem(mesh, [MaxStrain(interp="Q1"),
                           PassiveVar(SOLID_VAR, 2, "Q1")], {})
    prob2.finalize()
    for ms0, want in ((0.5 * vm_exact, vm_exact - 0.5 * vm_exact),
                      (2.0 * vm_exact, 0.0)):
        x0 = np.zeros(prob2.dofmap.n_dof)
        x0 = prob2.set_nodal_field(x0, SOLID_VAR, 0,
                                   c * mesh.coords[:, 0])
        x0 = prob2.set_nodal_field(x0, "max_strain", 0, ms0)
        R = np.asarray(prob2.residual(jnp.asarray(x0),
                                      prob2.base_params()))
        dm = prob2.dofmap
        d = dm.dof_of_node_svar[:, dm.svar("max_strain", 0)]
        np.testing.assert_allclose(R[d[d >= 0]].sum(), want, atol=1e-12)
