"""3D edge-curve BCs (bc_curve.c parity) + wetting-speed / CAP_REPULSE
kernels (mm_ns_bc.c parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh, rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_edge_set_geometry():
    """top & right sidesets of a box intersect in the edge x=1, z=1 of
    length Ly; the line measure must integrate to it exactly."""
    from goma_tpu.bc.edge import EdgeTraction

    mesh = box_mesh(2, 3, 2, elem="HEX27", ylim=(0.0, 2.0))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 1.0})
    prob.add_dirichlet("bottom", "temperature", 0, 0.0)
    prob.add_edge_kernel("top", "right", EdgeTraction("temperature", 1, 1.0))
    prob.finalize()
    es = prob.edge_sets[0]
    assert es.edge_elems.shape[0] == 3  # one edge per y-row of elements
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    R, _ = prob._assemble(x, prob.base_params())
    # line load q=1: total residual = -length of the curve = -2.0 over
    # non-Dirichlet temperature rows (partition of unity)
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("temperature")]
    on_edge_load = np.asarray(R)[d[d >= 0]]
    np.testing.assert_allclose(on_edge_load.sum(), -2.0, rtol=1e-12)
    # the load lands only on nodes of the edge x=1,z=1
    nz = np.where(np.abs(on_edge_load) > 1e-14)[0]
    c = mesh.coords[d >= 0][nz]
    np.testing.assert_allclose(c[:, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(c[:, 2], 1.0, atol=1e-12)


def test_edge_line_source_solution():
    """Steady conduction in a box with a line source on one edge and a
    Dirichlet face: global flux balance Q_in = source length * q."""
    from goma_tpu.bc.edge import EdgeTraction
    from goma_tpu.post import heat_flux, sideset_integral

    mesh = box_mesh(3, 3, 3, elem="HEX27")
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 1.0})
    prob.add_dirichlet("bottom", "temperature", 0, 0.0)
    prob.add_edge_kernel("top", "right", EdgeTraction("temperature", 1, 2.5))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    Fb = sideset_integral(prob, "bottom", heat_flux)
    q_out = float(Fb(jnp.asarray(res.x), prob.base_params()))
    np.testing.assert_allclose(abs(q_out), 2.5 * 1.0, rtol=1e-8)


def test_velo_tangent_edge():
    """Stokes flow in a box driven purely by a tangential edge velocity:
    the along-edge velocity at curve nodes must approach V (penalty) and
    point along y (the edge direction)."""
    from goma_tpu.bc.edge import VeloTangentEdge

    mesh = box_mesh(2, 2, 2, elem="HEX27")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=3, interp="Q2", transient=False,
                                   convection=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": 1.0})
    # clamp only the faces away from the driven edge (x=1, z=1), so the
    # edge trace can be uniformly V without endpoint conflicts
    for ns in ("bottom", "left"):
        for c in range(3):
            prob.add_dirichlet(ns, "velocity", c, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_edge_kernel("top", "right",
                         VeloTangentEdge(dim=3, value=1.0, penalty=1e6))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dm = prob.dofmap
    on_edge = (np.abs(mesh.coords[:, 0] - 1) < 1e-12) & \
        (np.abs(mesh.coords[:, 2] - 1) < 1e-12)
    dv = dm.dof_of_node_svar[np.where(on_edge)[0], dm.svar("velocity", 1)]
    uy = res.x[dv[dv >= 0]]
    # tangent of the (straight, +y) curve: u_y ~ V to penalty accuracy
    np.testing.assert_allclose(uy, 1.0, rtol=1e-4)


def test_cap_repulse_traction():
    """CAP_REPULSE adds the repulsive normal traction
    -P_rep/(dist/hscale)^repexp: check the assembled load against the exact
    surface integral on a flat face at known distance."""
    from goma_tpu.bc.wetting import CapRepulse

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    P_rep, hscale, repexp, wall_y = 3.0, 0.1, 2.0, 2.0
    prob.add_face_kernel("top", CapRepulse(
        dim=2, dist_fn=lambda x: wall_y - x[:, 1], P_rep=P_rep,
        hscale=hscale, repexp=repexp))
    prob.finalize()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    R, _ = prob._assemble(x, prob.base_params())
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("velocity", 1)]
    ok = d >= 0
    # top face at y=1, dist=1, n=(0,1): weak term -force*n phi with
    # force=-P_rep/(dist/h)^e: sum_i R_yi = +P_rep/(1/0.1)^2 * area(=1)
    total = np.asarray(R)[d[ok]].sum()
    np.testing.assert_allclose(total, P_rep * (hscale / 1.0) ** repexp,
                               rtol=1e-12)


def test_ls_wetting_speed_models():
    """Wetting kernels: zero velocity + interface normal at the static
    angle gives zero residual; off-equilibrium angles pull the fluid
    toward equilibrium with the model's speed law (Blake sinh, linear,
    Hoffman correlation, Cox asymptotics, Shikhmurzaev relation all
    finite and sign-correct)."""
    from goma_tpu.bc.wetting import LSWettingSpeed, hoffman_correlation_ca
    from goma_tpu.physics.level_set import FILL_VAR, FillEquation

    theta_s = 60.0
    for model in ("linear", "blake", "hoffman", "cox", "shik"):
        mesh = rectangle_mesh(4, 4, elem="QUAD9")
        prob = Problem(
            mesh,
            [Momentum(dim=2, interp="Q2", transient=False),
             Continuity(interp="Q1"), FillEquation(interp="Q2")],
            {"rho": 1.0, "mu": 1.0})
        prob.add_face_kernel("bottom", LSWettingSpeed(
            dim=2, theta_s_deg=theta_s, alpha=0.2, model=model,
            v0=0.7, g=2.0, beta=0.5, depth=0.1))
        prob.finalize()
        dm = prob.dofmap

        def assemble_with_angle(theta_deg):
            # planar interface at angle theta to the wall y=0 through x=0.5:
            # F = distance; wall normal is (0,-1); fluid normal grad F
            th = np.deg2rad(theta_deg)
            nf = np.array([np.cos(th + np.pi), np.sin(th + np.pi)])
            # choose nf so that cos_ca = n_wall . n_f = cos(theta):
            nf = np.array([-np.sin(th), -np.cos(th)])
            x = np.zeros(prob.dofmap.n_dof)
            dF = dm.dof_of_node_svar[:, dm.svar(FILL_VAR)]
            okF = dF >= 0
            x[dF[okF]] = (mesh.coords[okF] - [0.5, 0.0]) @ nf
            R, _ = prob._assemble(jnp.asarray(x, dtype=prob.dtype),
                                  prob.base_params())
            du = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
            return np.asarray(R)[du[du >= 0]].sum()

        r_eq = assemble_with_angle(theta_s)
        r_wet = assemble_with_angle(theta_s + 30.0)
        r_dry = assemble_with_angle(theta_s - 30.0)
        assert abs(r_eq) < 1e-10, (model, r_eq)
        assert np.isfinite(r_wet) and np.isfinite(r_dry)
        # off-equilibrium: wetting speeds of opposite signs
        assert r_wet * r_dry < 0, (model, r_wet, r_dry)

    # Hoffman correlation sanity: Ca monotone in theta, ~0 at theta ~ 0
    ca1 = float(hoffman_correlation_ca(jnp.cos(jnp.deg2rad(30.0))))
    ca2 = float(hoffman_correlation_ca(jnp.cos(jnp.deg2rad(120.0))))
    assert 0 < ca1 < ca2


def test_cox_wetting_ca_against_dense_integral():
    """The 10-pt Gauss Cox integral (VELO_THETA_COX, mm_ns_bc.c:10594)
    matches a dense trapezoid evaluation of int dtheta/f over
    [theta_eq, theta]; Ca has the wetting sign and grows with theta."""
    from goma_tpu.bc.wetting import cox_f, cox_wetting_ca

    lam, eps_slip = 0.1, 1e-3
    th_eq, th = np.deg2rad(60.0), np.deg2rad(110.0)
    ca = float(cox_wetting_ca(jnp.asarray(th), th_eq, lam=lam,
                              eps_slip=eps_slip))
    ts = np.linspace(th_eq, th, 20001)
    dense = np.trapezoid(1.0 / np.asarray(cox_f(jnp.asarray(ts), lam)), ts)
    ca_ref = dense / np.log(1.0 / eps_slip)
    np.testing.assert_allclose(ca, ca_ref, rtol=1e-8)
    assert ca > 0
    # receding angle -> negative Ca; monotone in theta
    ca_rec = float(cox_wetting_ca(jnp.asarray(np.deg2rad(30.0)), th_eq,
                                  lam=lam, eps_slip=eps_slip))
    assert ca_rec < 0
    ca2 = float(cox_wetting_ca(jnp.asarray(np.deg2rad(130.0)), th_eq,
                               lam=lam, eps_slip=eps_slip))
    assert ca2 > ca


def test_shik_wetting_speed_formula():
    """Shikhmurzaev relation (VELO_THETA_SHIK, mm_ns_bc.c:10631): V = 0 at
    equilibrium, matches the hand-evaluated formula off it, and the
    theta_max runaway guard keeps V finite past the cap."""
    from goma_tpu.bc.wetting import shik_wetting_speed

    th_eq, th_max, v0, g = np.deg2rad(60.0), np.deg2rad(150.0), 0.7, 2.0
    V_eq = float(shik_wetting_speed(jnp.asarray(np.cos(th_eq)),
                                    np.cos(th_eq), th_max, v0, g))
    assert abs(V_eq) < 1e-12
    th = np.deg2rad(100.0)
    u0 = lambda t: (np.sin(t) - t * np.cos(t)) / (np.sin(t) * np.cos(t) - t)
    rhs = (np.cos(th_eq) - np.cos(th)) / (
        (v0 - 1.0) * (u0(th) - u0(th_max)) + np.cos(th) - np.cos(th_max))
    V_ref = np.sqrt(g * v0) * rhs / (2.0 * np.sqrt(1.0 + rhs))
    V = float(shik_wetting_speed(jnp.asarray(np.cos(th)), np.cos(th_eq),
                                 th_max, v0, g))
    np.testing.assert_allclose(V, V_ref, rtol=1e-10)
    assert V > 0
    # past theta_max the 1.01*theta guard keeps the speed finite
    V_big = float(shik_wetting_speed(jnp.asarray(np.cos(np.deg2rad(170.0))),
                                     np.cos(th_eq), th_max, v0, g))
    assert np.isfinite(V_big)


def test_velo_normal_edge_directionality():
    """VeloNormalEdge penalizes n_a . u along the curve: zero for flow
    tangent to face A, proportional to penalty * (n_a . u) otherwise, with
    the load pointing along n_a."""
    from goma_tpu.bc.edge import VeloNormalEdge

    mesh = box_mesh(2, 2, 2, elem="HEX27")
    prob = Problem(mesh, [Momentum(dim=3, interp="Q2", transient=False,
                                   convection=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    prob.add_edge_kernel("top", "right", VeloNormalEdge(dim=3, penalty=1.0))
    prob.finalize()
    dm = prob.dofmap

    def edge_load(uvec):
        x = np.zeros(prob.dofmap.n_dof)
        for c in range(3):
            d = dm.dof_of_node_svar[:, dm.svar("velocity", c)]
            x[d[d >= 0]] = uvec[c]
        R, _ = prob._assemble(jnp.asarray(x, dtype=prob.dtype),
                              prob.base_params())
        # subtract the (velocity-field-induced) bulk residual: assemble the
        # same state without the edge kernel
        return np.asarray(R)

    mesh2 = box_mesh(2, 2, 2, elem="HEX27")
    ref = Problem(mesh2, [Momentum(dim=3, interp="Q2", transient=False,
                                   convection=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    ref.finalize()

    def bulk_load(uvec):
        x = np.zeros(ref.dofmap.n_dof)
        for c in range(3):
            d = ref.dofmap.dof_of_node_svar[:, ref.dofmap.svar("velocity", c)]
            x[d[d >= 0]] = uvec[c]
        R, _ = ref._assemble(jnp.asarray(x, dtype=ref.dtype), ref.base_params())
        return np.asarray(R)

    # u tangent to face A (top, n=(0,0,1)): no edge load
    d_t = edge_load([1.0, 0.0, 0.0]) - bulk_load([1.0, 0.0, 0.0])
    np.testing.assert_allclose(d_t, 0.0, atol=1e-12)
    # u = n_a: edge load = penalty * n_a-weighted line mass, z rows only,
    # total = penalty * length(edge) = 1.0
    d_n = edge_load([0.0, 0.0, 1.0]) - bulk_load([0.0, 0.0, 1.0])
    dz = dm.dof_of_node_svar[:, dm.svar("velocity", 2)]
    np.testing.assert_allclose(d_n[dz[dz >= 0]].sum(), 1.0, rtol=1e-12)
    dx = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
    np.testing.assert_allclose(d_n[dx[dx >= 0]], 0.0, atol=1e-12)


def test_hysteresis_wetting_window():
    """HysteresisWetting: pinned (zero residual) anywhere inside the
    [theta_rec, theta_adv] window, linear advancing/receding branches with
    the right slopes and signs outside it."""
    from goma_tpu.bc.wetting import HysteresisWetting
    from goma_tpu.physics.level_set import FILL_VAR, FillEquation

    th_adv, th_rec = 100.0, 60.0
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False),
         Continuity(interp="Q1"), FillEquation(interp="Q2")],
        {"rho": 1.0, "mu": 1.0})
    prob.add_face_kernel("bottom", HysteresisWetting(
        dim=2, theta_adv_deg=th_adv, theta_rec_deg=th_rec, alpha=0.2,
        beta_adv=0.5, beta_rec=0.25, depth=0.1))
    prob.finalize()
    dm = prob.dofmap

    def r_at(theta_deg):
        th = np.deg2rad(theta_deg)
        nf = np.array([-np.sin(th), -np.cos(th)])
        x = np.zeros(prob.dofmap.n_dof)
        dF = dm.dof_of_node_svar[:, dm.svar(FILL_VAR)]
        okF = dF >= 0
        x[dF[okF]] = (mesh.coords[okF] - [0.5, 0.0]) @ nf
        R, _ = prob._assemble(jnp.asarray(x, dtype=prob.dtype),
                              prob.base_params())
        du = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
        return np.asarray(R)[du[du >= 0]].sum()

    # pinned anywhere inside the window
    for th in (th_rec, 75.0, 90.0, th_adv):
        assert abs(r_at(th)) < 1e-10, th
    r_adv = r_at(th_adv + 20.0)
    r_rec = r_at(th_rec - 20.0)
    assert r_adv * r_rec < 0, (r_adv, r_rec)

    # advancing branch == plain linear wetting law with theta_s = theta_adv
    # (identical kernels there), receding branch == linear with theta_rec
    from goma_tpu.bc.wetting import LSWettingSpeed

    def r_linear(theta_deg, theta_s, beta):
        p2 = Problem(
            mesh,
            [Momentum(dim=2, interp="Q2", transient=False),
             Continuity(interp="Q1"), FillEquation(interp="Q2")],
            {"rho": 1.0, "mu": 1.0})
        p2.add_face_kernel("bottom", LSWettingSpeed(
            dim=2, theta_s_deg=theta_s, alpha=0.2, model="linear",
            beta=beta, depth=0.1))
        p2.finalize()
        d2 = p2.dofmap
        th = np.deg2rad(theta_deg)
        nf = np.array([-np.sin(th), -np.cos(th)])
        x = np.zeros(p2.dofmap.n_dof)
        dF = d2.dof_of_node_svar[:, d2.svar(FILL_VAR)]
        okF = dF >= 0
        x[dF[okF]] = (mesh.coords[okF] - [0.5, 0.0]) @ nf
        R, _ = p2._assemble(jnp.asarray(x, dtype=p2.dtype),
                            p2.base_params())
        du = d2.dof_of_node_svar[:, d2.svar("velocity", 0)]
        return np.asarray(R)[du[du >= 0]].sum()

    np.testing.assert_allclose(
        r_adv, r_linear(th_adv + 20.0, th_adv, 0.5), rtol=1e-10)
    np.testing.assert_allclose(
        r_rec, r_linear(th_rec - 20.0, th_rec, 0.25), rtol=1e-10)


def test_fill_ca_total_young_force():
    """FILL_CA: the band integral of delta |grad F| (t.n_ls) is exactly 1
    for a planar interface, so the TOTAL applied force equals the sharp
    Young traction sigma (sin(theta_ca) n_w + cos(theta_ca) t) regardless
    of the dynamic angle; WETTING_TENSION is its tangential branch."""
    from goma_tpu.bc.wetting import FillContactAngle, WettingTension
    from goma_tpu.physics.level_set import FILL_VAR, FillEquation

    sigma, th_ca = 0.8, 55.0
    for kernel, fdir in (
        (FillContactAngle(dim=2, theta_deg=th_ca, sigma=sigma, eps=0.15),
         sigma * np.array([np.cos(np.deg2rad(th_ca)) * (-1.0),
                           np.sin(np.deg2rad(th_ca)) * (-1.0)])),
        (WettingTension(dim=2, wetting_tension=sigma, eps=0.15),
         sigma * np.array([-1.0, 0.0])),
    ):
        mesh = rectangle_mesh(8, 4, elem="QUAD9")
        prob = Problem(
            mesh,
            [Momentum(dim=2, interp="Q2", transient=False),
             Continuity(interp="Q1"), FillEquation(interp="Q2")],
            {"rho": 1.0, "mu": 1.0})
        prob.add_face_kernel("bottom", kernel)
        prob.finalize()
        dm = prob.dofmap
        # planar interface through (0.5, 0) at 65 deg dynamic angle:
        # n_w = (0,-1), t = (-1, 0) (orientation sign), n_ls as in the
        # wetting tests above
        th = np.deg2rad(65.0)
        nf = np.array([-np.sin(th), -np.cos(th)])
        x = np.zeros(prob.dofmap.n_dof)
        dF = dm.dof_of_node_svar[:, dm.svar(FILL_VAR)]
        okF = dF >= 0
        x[dF[okF]] = (mesh.coords[okF] - [0.5, 0.0]) @ nf
        R, _ = prob._assemble(jnp.asarray(x, dtype=prob.dtype),
                              prob.base_params())
        R = np.asarray(R)
        tot = []
        for comp in range(2):
            du = dm.dof_of_node_svar[:, dm.svar("velocity", comp)]
            tot.append(R[du[du >= 0]].sum())
        # residual = -int phi f => sum = -total force; t=(-1,0), n_w=(0,-1)
        np.testing.assert_allclose(-np.array(tot), fdir, rtol=6e-3,
                                   err_msg=type(kernel).__name__)
