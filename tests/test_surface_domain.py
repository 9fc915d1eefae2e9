"""Surface-domain coupling BCs (bc_surfacedomain.c / SDC_* family parity):
mass transfer between volumetric domains and reaction-induced Stefan flow."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.bc import SDCStefanFlow, SurfDomainMassFlux
from goma_tpu.fem import Problem
from goma_tpu.mesh.generators import rectangle_mesh
from goma_tpu.mesh.interface import find_interface_faces, split_interface
from goma_tpu.mesh.mesh import Block, Mesh
from goma_tpu.physics import Continuity, Momentum, Species
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check


def _two_block_strip(nx=4, ny=2):
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


def test_surfdomain_mass_flux_exact():
    """Two-domain diffusion with an mtc-driven surface-domain flux: at
    steady state q = Da(1-Ya)/L = mtc(Ya-Yc) = Db Yb/L with exact linear
    profiles (mass_flux_sd_bc, src/bc_surfacedomain.c:44)."""
    Da, Db, mtc, Yc = 1.5, 0.4, 2.0, 0.0
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
    prob.add_interface_kernel(pairs, SurfDomainMassFlux(mtc=mtc, Y_c=Yc))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=4, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    Y = prob.get_nodal_field(res.x, "species")
    # q = mtc (Ya - Yc) with Ya = 1 - 0.5 q / Da:
    q = mtc * (1.0 - Yc) / (1.0 + 0.5 * mtc / Da)
    Ya = 1.0 - 0.5 * q / Da
    Yb = 0.5 * q / Db
    x = mesh.coords[:, 0]
    exact = np.where(x <= 0.5, 1.0 - q * x / Da, q * (1.0 - x) / Db)
    exact[new] = Yb
    np.testing.assert_allclose(Y, exact, atol=1e-9)
    np.testing.assert_allclose(Y[orig].mean(), Ya, atol=1e-9)


def test_sdc_stefan_flow_induced_velocity():
    """A surface reaction consuming gas at molar rate S on the bottom wall
    induces a uniform Stefan inflow v_y = W S / rho through the channel
    (sdc_stefan_flow, src/mm_ns_bc.c:1006)."""
    W, S, rho = 0.8, 0.25, 1.0
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(
        mesh,
        [[Momentum(2, interp="Q2", transient=False, convection=False),
          Continuity(interp="Q1")]],
        [{"rho": rho, "mu": 1.0}],
    )
    # side walls: no x-flow; top: fixed exit velocity left free (natural)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
    prob.add_dirichlet("top", "pressure", 0, 0.0)

    def rates(sfv, mat, params):
        nq = sfv.x.shape[0]
        return jnp.full((nq, 1), S)

    # bottom outward normal is (0,-1): n.rho v + W S = 0 -> v_y = W S / rho
    prob.add_face_kernel("bottom", SDCStefanFlow(2, [W], rates, penalty=1e8))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    vy = prob.get_nodal_field(res.x, "velocity", 1)
    vx = prob.get_nodal_field(res.x, "velocity", 0)
    np.testing.assert_allclose(vy, W * S / rho, atol=1e-6)
    np.testing.assert_allclose(vx, 0.0, atol=1e-6)


def test_sdc_jacobian_ad_vs_fd():
    """AD Jacobian through the SDC kernels (incl. cross-block mass-flux
    coupling) matches finite differences."""
    mesh = _two_block_strip(3, 2)
    pairs = find_interface_faces(mesh, 0, 1)
    split_interface(mesh, pairs)
    prob = Problem(
        mesh,
        [[Species(1, interp="Q1", transient=False, convection=False)],
         [Species(1, interp="Q1", transient=False, convection=False)]],
        [{"diffusivity": 1.0}, {"diffusivity": 2.0}],
    )
    prob.add_interface_kernel(pairs, SurfDomainMassFlux(mtc=1.7, Y_c=0.3))
    prob.finalize()
    rng = np.random.RandomState(0)
    x = rng.randn(prob.dofmap.n_dof)
    chk = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=14)
    assert chk.ok, chk.report()
