"""3D contact-angle edge BCs (CA_EDGE / VAR_CA_EDGE) and the porous / leak
BC family (POROUS_FLUX, LATENT_HEAT, VNORM_LEAK).

Reference anchors: ``src/mm_ns_bc.c:9748 fapply_CA``, ``:9843
fapply_var_CA``, ``src/mm_fill_aux.c:2157 calc_CL_normal``,
``src/mm_fill_porous.c:3855 porous_mass_flux_surf_bc`` + ``:7038
load_gas_conc`` (Kelvin), ``src/bc_integ.c:1603 lat_heat_bc``."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh, rectangle_mesh
from goma_tpu.physics import Continuity, EllipticMesh, Energy, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver

MV = "mesh_displacement"


def _solve(prob, x0=None, max_iter=30, tol=1e-9):
    opts = NewtonOptions(max_iter=max_iter, tol_residual=tol,
                         linear_solver="direct")
    x0 = np.zeros(prob.dofmap.n_dof) if x0 is None else x0
    res = NewtonSolver(prob, opts).solve(x0, prob.base_params())
    assert res.converged, res.summary()
    return res


def _edge_fs_dot(prob, x):
    """n_fs . n_ss at the edge quadrature points of edge set 0, evaluated
    on the displaced configuration of state x."""
    from goma_tpu.bc.edge import eval_edgevars

    es = prob.edge_sets[0]
    bd = prob.dofmap.blocks[es.block_index]
    T = prob._tables
    gather = np.asarray(T["eg0"])
    Xref = np.asarray(T["ex0"])
    x = np.asarray(x)
    ewts = jnp.asarray(es.ewts, dtype=prob.dtype)
    dots, ncls = [], []
    from goma_tpu.bc.edge import contact_line_normal

    for i in range(gather.shape[0]):
        q_e = jnp.asarray(x[gather[i]], dtype=prob.dtype)
        etab = {k: jnp.asarray(np.asarray(T[f"et0:{k}"])[i], dtype=prob.dtype)
                for k in es.etabs}
        efv = eval_edgevars(q_e, 0.0 * q_e, jnp.asarray(Xref[i], dtype=prob.dtype),
                            etab, ewts, bd.slots, prob.dtype)
        dots.append(np.einsum("qk,qk->q", np.asarray(efv.normal_a),
                              np.asarray(efv.normal_b)))
        ncls.append(np.asarray(contact_line_normal(efv)))
    return np.concatenate(dots), np.concatenate(ncls)


def _mesh_box_problem():
    mesh = box_mesh(3, 3, 2, elem="HEX8", zlim=(0.0, 0.5))
    prob = Problem(mesh, [EllipticMesh(3, interp="Q1")], {})
    for c in range(3):
        prob.add_dirichlet("bottom", MV, c, 0.0)
    prob.add_dirichlet("left", MV, 0, 0.0)
    prob.add_dirichlet("right", MV, 0, 0.0)   # wall stays the plane x=1
    prob.add_dirichlet("front", MV, 1, 0.0)
    prob.add_dirichlet("back", MV, 1, 0.0)
    return prob


def test_ca_edge_static_angle():
    """CA_EDGE: the free surface (top) tilts near the wall (right) until
    n_fs . n_ss = cos(theta) along the contact curve."""
    from goma_tpu.bc.edge import CAEdge

    theta = np.deg2rad(70.0)
    prob = _mesh_box_problem()
    prob.add_edge_kernel("top", "right", CAEdge(theta, penalty=1e4))
    prob.finalize()
    res = _solve(prob)
    dots, _ = _edge_fs_dot(prob, res.x)
    np.testing.assert_allclose(dots, np.cos(theta), atol=2e-2)
    # the mesh really moved (contact line slid up or down the wall)
    assert np.linalg.norm(np.asarray(res.x)) > 1e-3


def test_var_ca_edge_dynamic_angle():
    """VAR_CA_EDGE: cos(theta) = cos(theta_s) - cT mu (n_cl.v_web)/sigma.
    With the wall plane x=1 and the edge along y, n_cl ~ +z, so a web
    moving down (-z) increases the apparent cos; verified against the
    solved state's own contact-line normal."""
    from goma_tpu.bc.edge import VarCAEdge

    mu, sigma, cT = 2.0, 4.0, 1.0
    v_web = (0.0, 0.0, -0.6)
    prob = _mesh_box_problem()
    prob.add_edge_kernel("top", "right",
                         VarCAEdge(np.deg2rad(90.0), cT, v_web=v_web,
                                   mu=mu, sigma=sigma, penalty=1e4))
    prob.finalize()
    res = _solve(prob)
    dots, ncls = _edge_fs_dot(prob, res.x)
    expected = np.cos(np.deg2rad(90.0)) - cT * mu * (
        ncls @ np.asarray(v_web)) / sigma
    np.testing.assert_allclose(dots, expected, atol=2e-2)
    # and the sign convention: web pulling down -> cos > 0 (angle < 90)
    assert np.all(dots > 0.25)


def test_kelvin_gas_density_formula():
    from goma_tpu.bc.porous_leak import kelvin_gas_density

    mat = {"vapor_Mw": 0.018, "gas_R": 8.314, "rho_liquid": 1000.0,
           "vapor_T": 300.0, "vapor_Psat": 3500.0}
    p = jnp.asarray([-1e7, 0.0, 5.0])
    rho = np.asarray(kelvin_gas_density(p, mat, {}))
    rho_sat = 0.018 / (8.314 * 300.0) * 3500.0
    np.testing.assert_allclose(rho[1], rho_sat, rtol=1e-12)
    np.testing.assert_allclose(rho[2], rho_sat, rtol=1e-12)  # pc clamped at 0
    np.testing.assert_allclose(
        rho[0], rho_sat * np.exp(-1e7 * 0.018 / (1000.0 * 8.314 * 300.0)),
        rtol=1e-12)


def _porous_column(k_m, k_m1=0.0, p_0=0.0):
    from goma_tpu.bc.porous_leak import PorousMassFlux
    from goma_tpu.physics.porous import PorousFlow, VanGenuchten

    mesh = rectangle_mesh(1, 8, elem="QUAD4", xlim=(0, 0.1), ylim=(0, 1.0))
    vg = VanGenuchten(alpha=1.0, n=2.0)
    mat = {"permeability": 0.5, "mu_liquid": 1.0, "porosity": 0.4,
           "vapor_Psat": 1.0, "vapor_Mw": 1.0, "gas_R": 1.0, "vapor_T": 1.0,
           "rho_liquid": 1.0}
    prob = Problem(mesh, [PorousFlow(model=vg, interp="Q1",
                                     transient=False)], mat)
    prob.add_dirichlet("bottom", "porous_pressure", 0, 2.0)
    prob.add_face_kernel("top", PorousMassFlux(k_m, Y_c=0.0, k_m1=k_m1,
                                               p_0=p_0))
    prob.finalize()
    return prob, mat


def test_porous_mass_flux_saturated_column():
    """Steady saturated column with evaporation at the top: the Kelvin
    density is rho_sat (pc = 0), so the evaporative flux is constant and
    the exact profile is linear, p = p_b - (q/K) z."""
    prob, mat = _porous_column(k_m=1.0)
    res = _solve(prob)
    q = mat["porosity"] * 1.0 * (1.0 * 1.0)          # phi k_m rho_sat
    K = mat["permeability"] / mat["mu_liquid"]       # kr = 1 (saturated)
    coords = prob.mesh.coords
    d = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("porous_pressure", 0)]
    p = np.asarray(res.x)[d]
    np.testing.assert_allclose(p, 2.0 - q / K * coords[:, 1], atol=1e-8)


def test_porous_mass_flux_extraction_term():
    """Adding the forced-extraction term k_m1 (p - p_0) for p >= p_0 makes
    the top flux solution-dependent; exact slope s solves
    (K + phi k_m1) s = -(q + phi k_m1 p_b)."""
    prob, mat = _porous_column(k_m=1.0, k_m1=0.5, p_0=0.0)
    res = _solve(prob)
    phi_p, K = mat["porosity"], mat["permeability"]
    q = phi_p * 1.0
    s = -(q + phi_p * 0.5 * 2.0) / (K + phi_p * 0.5)
    coords = prob.mesh.coords
    d = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("porous_pressure", 0)]
    p = np.asarray(res.x)[d]
    assert p.min() > 0.0  # stayed in the gated/saturated regime
    np.testing.assert_allclose(p, 2.0 + s * coords[:, 1], atol=1e-8)


def test_latent_heat_flux_slab():
    """Evaporative cooling of a conducting slab: q_top = L * mdot gives the
    exact linear profile T = T_b - (L mdot / k) z."""
    from goma_tpu.bc.porous_leak import LatentHeatFlux

    L, mdot, k = 3.0, 0.25, 2.0
    mesh = rectangle_mesh(1, 6, elem="QUAD9", xlim=(0, 0.2), ylim=(0, 1.0))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": k})
    prob.add_dirichlet("bottom", "temperature", 0, 1.0)
    prob.add_face_kernel("top", LatentHeatFlux([(L, mdot)]))
    prob.finalize()
    res = _solve(prob)
    coords = prob.mesh.coords
    d = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("temperature", 0)]
    T = np.asarray(res.x)[d]
    np.testing.assert_allclose(T, 1.0 - L * mdot / k * coords[:, 1],
                               atol=1e-10)


def test_vnorm_leak_uniform_suction():
    """VNORM_LEAK on the top wall admits the prescribed normal leak
    velocity: a channel fed v0 from below reaches the uniform solution
    u = (0, v0) with n.u = v0 through the leaky lid."""
    from goma_tpu.bc.porous_leak import VNormLeak

    v0 = 0.3
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    prob.add_dirichlet("bottom", "velocity", 1, v0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)  # slip side walls
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel("top", VNormLeak(dim=2, leak=v0, penalty=1e6))
    prob.finalize()
    res = _solve(prob)
    dm = prob.dofmap
    ux = np.asarray(res.x)[dm.dof_of_node_svar[:, dm.svar("velocity", 0)]]
    uy = np.asarray(res.x)[dm.dof_of_node_svar[:, dm.svar("velocity", 1)]]
    np.testing.assert_allclose(ux, 0.0, atol=1e-6)
    np.testing.assert_allclose(uy, v0, atol=1e-6)


def test_ca_edge_or_fix_gate():
    """CA_EDGE_OR_FIX: with the feature far away it reproduces CA_EDGE
    exactly; with the feature below the unconstrained contact line, the
    line pins at the feature plane instead."""
    from goma_tpu.bc.edge import CAEdge, CAEdgeOrFix

    theta = np.deg2rad(70.0)
    # far feature: identical to CAEdge
    p1 = _mesh_box_problem()
    p1.add_edge_kernel("top", "right", CAEdgeOrFix(
        theta, feature_point=(1.0, 0.0, 10.0), feature_dir=(0, 0, 1),
        penalty=1e4))
    p1.finalize()
    r1 = _solve(p1)
    p2 = _mesh_box_problem()
    p2.add_edge_kernel("top", "right", CAEdge(theta, penalty=1e4))
    p2.finalize()
    r2 = _solve(p2)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               atol=1e-10)

    # near feature: the 70-deg line would rise above z = z_feat; the gate
    # pins it at the feature height instead
    dmz = p2.dofmap
    # contact-line z displacement of the unconstrained solve
    from goma_tpu.fem.fields import MESH_VAR
    dz = p2.get_nodal_field(np.asarray(r2.x), MESH_VAR, 2)
    c = p2.mesh.coords
    edge = np.isclose(c[:, 0], 1.0) & np.isclose(c[:, 2], 0.5)
    dz_free = dz[edge].mean()
    assert abs(dz_free) > 5e-3  # the line moved
    z_feat = 0.5 + 0.5 * dz_free  # halfway to the free position
    p3 = _mesh_box_problem()
    p3.add_edge_kernel("top", "right", CAEdgeOrFix(
        theta, feature_point=(1.0, 0.0, z_feat),
        feature_dir=(0, 0, np.sign(dz_free)), penalty=1e4))
    p3.finalize()
    r3 = _solve(p3)
    dz3 = p3.get_nodal_field(np.asarray(r3.x), MESH_VAR, 2)
    zline = c[edge, 2] + dz3[edge]
    # pinned at the feature height (within the smooth gate width: the
    # blend balances slightly before the feature)
    np.testing.assert_allclose(zline, z_feat, atol=0.01)
