"""Discontinuous interfacial variables + cross-block interface kernels
(mm_interface.c / VL_EQUIL parity; J_stress_neighbor-style coupling)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh.interface import find_interface_faces, split_interface
from goma_tpu.mesh.mesh import Block, Mesh
from goma_tpu.physics import Energy, InterfaceExchange, Species
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check


def _two_block_strip(nx=4, ny=2):
    """[0,1]^2 split at x=0.5 into blocks A (left) and B (right), QUAD4."""
    gx, gy = 2 * nx + 1, ny + 1
    xs = np.linspace(0, 1, gx)
    ys = np.linspace(0, 1, gy)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def nid(i, j):
        return j * gx + i

    conn_a, conn_b = [], []
    for j in range(ny):
        for i in range(2 * nx):
            c = [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            (conn_a if i < nx else conn_b).append(c)
    mesh = Mesh(2, coords, [
        Block("A", "QUAD4", np.asarray(conn_a, dtype=np.int32)),
        Block("B", "QUAD4", np.asarray(conn_b, dtype=np.int32)),
    ])
    mesh.nodesets = {
        "left": np.where(np.isclose(coords[:, 0], 0.0))[0].astype(np.int32),
        "right": np.where(np.isclose(coords[:, 0], 1.0))[0].astype(np.int32),
    }
    mesh.sidesets = {}
    return mesh


def test_contact_resistance_two_layer():
    """Layered conduction with interfacial contact resistance h: exact
    solution q = dT / (La/ka + Lb/kb + 1/h) with temperature jump q/h."""
    ka, kb, h = 2.0, 0.5, 4.0
    mesh = _two_block_strip(4, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    assert pairs.elems_a.shape[0] == 2
    orig, new = split_interface(mesh, pairs)
    # right nodeset unaffected by split (interface is interior)
    prob = Problem(
        mesh,
        [[Energy(interp="Q1", transient=False, convection=False)],
         [Energy(interp="Q1", transient=False, convection=False)]],
        [{"rho": 1.0, "Cp": 1.0, "k": ka}, {"rho": 1.0, "Cp": 1.0, "k": kb}],
    )
    prob.add_dirichlet("left", "temperature", 0, 1.0)
    prob.add_dirichlet("right", "temperature", 0, 0.0)
    prob.add_interface_kernel(pairs, InterfaceExchange("temperature", coeff=h))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=4, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    T = prob.get_nodal_field(res.x, "temperature")
    q = 1.0 / (0.5 / ka + 0.5 / kb + 1.0 / h)
    x = mesh.coords[:, 0]
    # side A nodes: original interface nodes belong to A; duplicates to B
    exact = np.where(x <= 0.5, 1.0 - q * x / ka, q * (1.0 - x) / kb)
    exact_b_ifc = q * 0.5 / kb
    exact[new] = exact_b_ifc
    np.testing.assert_allclose(T, exact, atol=1e-9)
    # jump equals q/h
    jump = T[orig].mean() - T[new].mean()
    np.testing.assert_allclose(jump, q / h, atol=1e-9)


def test_henry_partition_species():
    """Large exchange coefficient enforces c_a = K c_b with flux continuity
    (VL_EQUIL / Henry-law partitioning)."""
    Da, Db, K = 1.5, 0.4, 2.0
    mesh = _two_block_strip(4, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Species(1, interp="Q1", transient=False, convection=False)],
         [Species(1, interp="Q1", transient=False, convection=False)]],
        [{"diffusivity": Da}, {"diffusivity": Db}],
    )
    prob.add_dirichlet("left", "species", 0, 1.0)
    prob.add_dirichlet("right", "species", 0, 0.0)
    prob.add_interface_kernel(pairs, InterfaceExchange("species", coeff=1e8, K=K))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=4, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    c = prob.get_nodal_field(res.x, "species")
    # exact: q = Da(1-ca)/0.5 = Db cb/0.5, ca = K cb
    cb = Da / (Da * K + Db)
    ca = K * cb
    q = Db * cb / 0.5
    x = mesh.coords[:, 0]
    exact = np.where(x <= 0.5, 1.0 - q * x / Da, q * (1.0 - x) / Db)
    exact[new] = cb
    np.testing.assert_allclose(c, exact, atol=1e-6)
    np.testing.assert_allclose(c[orig].mean(), ca, atol=1e-6)


def test_interface_jacobian_cross_coupling():
    """AD Jacobian of the interface-coupled system matches FD, including the
    cross-block (neighbor) entries."""
    mesh = _two_block_strip(3, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Energy(interp="Q1", transient=False, convection=False)],
         [Energy(interp="Q1", transient=False, convection=False)]],
        [{"rho": 1.0, "Cp": 1.0, "k": 1.0}, {"rho": 1.0, "Cp": 1.0, "k": 3.0}],
    )
    prob.add_interface_kernel(pairs, InterfaceExchange("temperature", coeff=2.5,
                                                       K=1.3))
    prob.finalize()
    rng = np.random.RandomState(0)
    x = rng.randn(prob.dofmap.n_dof)
    chk = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=14)
    assert chk.ok, chk.report()


def test_flory_huggins_vle():
    """VL_POLY: composition-dependent Flory-Huggins partition through the
    callable-K path; at the penalty limit the interface satisfies
    c_gas = a1(c_liq) psat/P with the FH activity, checked against the
    closed form at the converged interface composition."""
    from goma_tpu.physics.interface import flory_huggins_partition

    Da, Db = 1.2, 0.3
    chi, n_poly, psat_P = 0.8, 50.0, 0.6
    mesh = _two_block_strip(6, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Species(1, interp="Q1", transient=False, convection=False)],
         [Species(1, interp="Q1", transient=False, convection=False)]],
        [{"diffusivity": Da}, {"diffusivity": Db}],
    )
    # gas side A (left, Dirichlet low), polymer liquid side B (right, rich)
    prob.add_dirichlet("left", "species", 0, 0.01)
    prob.add_dirichlet("right", "species", 0, 0.5)
    prob.add_interface_kernel(pairs, InterfaceExchange(
        "species", coeff=1e8,
        K=flory_huggins_partition(chi, n_poly, psat_P)))
    prob.finalize()
    x0 = np.full(prob.dofmap.n_dof, 0.1)
    res = NewtonSolver(prob, NewtonOptions(max_iter=20, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged, res.summary()
    c = prob.get_nodal_field(res.x, "species")
    ca = c[orig].mean()
    cb = c[new].mean()
    phi1 = cb
    a1 = phi1 * np.exp((1 - 1 / n_poly) * (1 - phi1) + chi * (1 - phi1) ** 2)
    np.testing.assert_allclose(ca, a1 * psat_P, rtol=1e-6)
    # flux continuity: piecewise-linear profiles with matching flux
    qa = Da * (ca - 0.01) / 0.5
    qb = Db * (0.5 - cb) / 0.5
    np.testing.assert_allclose(qa, qb, rtol=1e-5)


def test_kinetic_prxn_exchange():
    """VL_EQUIL_PRXN / IS_EQUIL_PRXN kinetic flavor: finite-rate exchange
    q = k_f (c_a - K c_b) produces the exact kinetic jump (the reference's
    equilibrium-with-surface-reaction form, raoults_law_prxn)."""
    Da, Db, kf, K = 1.0, 0.5, 3.0, 1.5
    mesh = _two_block_strip(4, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Species(1, interp="Q1", transient=False, convection=False)],
         [Species(1, interp="Q1", transient=False, convection=False)]],
        [{"diffusivity": Da}, {"diffusivity": Db}],
    )
    prob.add_dirichlet("left", "species", 0, 1.0)
    prob.add_dirichlet("right", "species", 0, 0.0)
    prob.add_interface_kernel(pairs, InterfaceExchange("species", coeff=kf,
                                                       K=K))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    c = prob.get_nodal_field(res.x, "species")
    ca, cb = c[orig].mean(), c[new].mean()
    # steady flux: q = Da(1-ca)/.5 = kf(ca - K cb) = Db(cb-0)/.5
    # solve the 2x2 linear system for the exact interface values
    A = np.array([[Da / 0.5 + kf, -kf * K], [kf, -kf * K - Db / 0.5]])
    b = np.array([Da / 0.5 * 1.0, 0.0])
    ca_ex, cb_ex = np.linalg.solve(A, b)
    np.testing.assert_allclose([ca, cb], [ca_ex, cb_ex], rtol=1e-8)


def test_interface_match_cross_variable():
    """InterfaceMatch (VP_EQUIL/POROUS_GAS machinery): gas-side species
    equation tied to the other block's TEMPERATURE equation through the
    saturation relation y = a T, with scaled conservative flux exchange —
    exact two-resistance solution."""
    from goma_tpu.physics.interface import InterfaceMatch

    Da, kb, a_sat, sb_scale = 1.0, 0.6, 2.0, 0.7
    mesh = _two_block_strip(4, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Species(1, interp="Q1", transient=False, convection=False)],
         [Energy(interp="Q1", transient=False, convection=False)]],
        [{"diffusivity": Da}, {"rho": 1.0, "Cp": 1.0, "k": kb}],
    )
    prob.add_dirichlet("left", "species", 0, 1.0)
    prob.add_dirichlet("right", "temperature", 0, 0.2)
    prob.add_interface_kernel(pairs, InterfaceMatch(
        "species", "temperature", coeff=1e8,
        g_b=lambda sbv, mat, params: a_sat * sbv.val["temperature"][:, 0],
        scale_b=sb_scale))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    y = prob.get_nodal_field(res.x, "species")
    T = prob.get_nodal_field(res.x, "temperature")
    yi = y[orig].mean()
    Ti = T[new].mean()
    # exact: Da(1-yi)/.5 = q ; kb(Ti-.2)/.5 = sb q ; yi = a Ti
    Tb_ex = (Da + kb * 0.2 / sb_scale / 1.0) / (Da * a_sat + kb / sb_scale)
    np.testing.assert_allclose(Ti, Tb_ex, rtol=1e-7)
    np.testing.assert_allclose(yi, a_sat * Tb_ex, rtol=1e-7)


def test_light_fresnel_jump_two_layer():
    """LIGHTP_JUMP: Beer-Lambert transmission through a refractive-index
    interface at normal incidence — downstream intensity picks up the
    Fresnel factor Y = (n_up/n_down)^2 (1 - R) exactly."""
    from goma_tpu.physics.scalar_transport import (LightFresnelJump,
                                                   LightIntensity)

    I0, b_up, b_down = 1.0, 0.5, 1.2
    n_up, n_down = 1.0, 1.5
    mesh = _two_block_strip(5, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    # block 0 (left, upstream) propagates +x; block 1 downstream
    prob = Problem(
        mesh,
        [[LightIntensity((1.0, 0.0), b_up, interp="Q1", supg=0.5)],
         [LightIntensity((1.0, 0.0), b_down, interp="Q1", supg=0.5)]],
        [{"refindex": n_up}, {"refindex": n_down}],
    )
    prob.add_dirichlet("left", "light_intp", 0, I0)
    # downstream block is side B of the pairs (side A = upstream block 0):
    # the jump kernel pins the DOWNSTREAM rows, so swap roles via pair
    # orientation: kernel expects A = downstream -> flip a/b
    from goma_tpu.mesh.interface import InterfacePairs
    flipped = InterfacePairs(block_a=pairs.block_b, block_b=pairs.block_a,
                             elems_a=pairs.elems_b, faces_a=pairs.faces_b,
                             elems_b=pairs.elems_a, faces_b=pairs.faces_a)
    prob.add_interface_kernel(flipped, LightFresnelJump())
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    Ip = prob.get_nodal_field(res.x, "light_intp", 0)
    x = mesh.coords[:, 0]
    R = ((n_down - n_up) / (n_down + n_up)) ** 2
    Y = (n_up / n_down) ** 2 * (1 - R)
    I_if = I0 * np.exp(-b_up * 0.5)
    # downstream profile
    right_nodes = np.unique(mesh.blocks[1].conn)
    right_nodes = right_nodes[x[right_nodes] > 0.5 + 1e-9]
    exact = Y * I_if * np.exp(-b_down * (x[right_nodes] - 0.5))
    np.testing.assert_allclose(Ip[right_nodes], exact, rtol=2e-2)
    # upstream unaffected (pure decay)
    left_nodes = np.unique(mesh.blocks[0].conn)
    left_nodes = left_nodes[x[left_nodes] < 0.5 - 1e-9]
    np.testing.assert_allclose(Ip[left_nodes],
                               I0 * np.exp(-b_up * x[left_nodes]), rtol=2e-2)


def test_mass_flux_continuity_density_jump():
    """VELO_NORMAL_DISC: rho-weighted normal velocity continuity across a
    discontinuous-velocity interface — with rho_a/rho_b = 3, the B-side
    normal velocity triples exactly."""
    from goma_tpu.physics.interface import MassFluxContinuity
    from goma_tpu.fem.equations import PassiveVar

    rho_a, rho_b, u_in = 3.0, 1.0, 0.5
    mesh = _two_block_strip(4, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    orig, new = split_interface(mesh, pairs)
    eqs = [[PassiveVar("velocity", 2, "Q1", reg=1e-10)],
           [PassiveVar("velocity", 2, "Q1", reg=1e-10)]]
    prob = Problem(mesh, eqs, [{"rho": rho_a}, {"rho": rho_b}])
    # drive side A's velocity; side B's is determined by the interface pair
    an = np.unique(mesh.blocks[0].conn)
    mesh.nodesets["aset"] = an.astype(np.int32)
    prob.add_dirichlet("aset", "velocity", 0, u_in)
    prob.add_dirichlet("aset", "velocity", 1, 0.0)
    bn = np.setdiff1d(np.unique(mesh.blocks[1].conn), an)
    inner_b = bn[~np.isclose(mesh.coords[bn, 0], 0.5)]
    mesh.nodesets["bset"] = inner_b.astype(np.int32)
    prob.add_dirichlet("bset", "velocity", 0, 0.0)
    prob.add_dirichlet("bset", "velocity", 1, 0.0)
    prob.add_interface_kernel(pairs, MassFluxContinuity(dim=2))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    # interface B-side duplicates carry rho_a/rho_b * u_in
    np.testing.assert_allclose(u[new], rho_a / rho_b * u_in, atol=1e-8)
