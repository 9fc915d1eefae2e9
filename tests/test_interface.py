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
