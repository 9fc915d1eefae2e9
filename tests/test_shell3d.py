"""3D shell (surface) elements: QUAD/TRI manifolds embedded in 3D
(reference BILINEAR/BIQUAD_SHELL, TRISHELL)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh
from goma_tpu.mesh.mesh import Block, Mesh
from goma_tpu.physics import Energy, ShellConduction, attach_shell_block
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _cylinder_surface_mesh(n_theta=24, n_z=6, R=1.0, H=2.0):
    """Closed cylinder wall meshed with QUAD4 shell elements in 3D."""
    th = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    zz = np.linspace(0, H, n_z + 1)
    coords = np.array([[R * np.cos(t), R * np.sin(t), z] for z in zz for t in th])
    def nid(i, k):
        return k * n_theta + (i % n_theta)
    conn = [
        [nid(i, k), nid(i + 1, k), nid(i + 1, k + 1), nid(i, k + 1)]
        for k in range(n_z) for i in range(n_theta)
    ]
    mesh = Mesh(3, coords, [Block("wall", "QUAD4", np.asarray(conn, dtype=np.int32))])
    mesh.nodesets = {
        "bottom": np.arange(n_theta, dtype=np.int32),
        "top": np.arange(n_z * n_theta, (n_z + 1) * n_theta, dtype=np.int32),
    }
    mesh.sidesets = {}
    return mesh, th


def test_laplace_beltrami_on_cylinder():
    """Laplace on a developable cylinder == flat strip: with T(z=0)=cos(theta),
    T(z=H)=0 and periodic closure, T = cos(theta) sinh((H-z)/R)/sinh(H/R)."""
    R, H = 1.0, 2.0
    mesh, th = _cylinder_surface_mesh(32, 8, R=R, H=H)
    prob = Problem(mesh, [ShellConduction(1.0, interp="Q1")], {})
    prob.add_dirichlet("bottom", "temperature", 0,
                       lambda X: X[:, 0] / R)  # cos(theta)
    prob.add_dirichlet("top", "temperature", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature")
    theta = np.arctan2(mesh.coords[:, 1], mesh.coords[:, 0])
    z = mesh.coords[:, 2]
    exact = np.cos(theta) * np.sinh((H - z) / R) / np.sinh(H / R)
    # QUAD4 on a 32x8 grid: a couple % discretization error
    assert np.abs(T - exact).max() < 0.02, np.abs(T - exact).max()


def test_attach_shell_on_hex_face_and_couple():
    """High-conductivity shell layer on the top face of a 3D conduction box
    shortcircuits the top: with insulated lateral walls the bulk field stays
    1D and the shell changes nothing (consistency); with a hot edge on the
    shell only, heat enters the bulk through shared nodes."""
    mesh = box_mesh(3, 3, 3, elem="HEX8")
    bi = attach_shell_block(mesh, "top", name="lid")
    assert mesh.blocks[bi].elem_type == "QUAD4"
    assert mesh.blocks[bi].conn.shape == (9, 4)
    # shared nodes: every shell node is a bulk top node
    top = set(mesh.nodesets["top"].tolist())
    assert set(mesh.blocks[bi].conn.ravel().tolist()) <= top

    eqs = [
        [Energy(interp="Q1", transient=False, convection=False)],
        [ShellConduction(50.0, interp="Q1")],
    ]
    mats = [{"rho": 1.0, "Cp": 1.0, "k": 1.0}, {}]
    prob = Problem(mesh, eqs, mats)
    prob.add_dirichlet("bottom", "temperature", 0, 0.0)
    prob.add_dirichlet("top", "temperature", 0, 1.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature")
    # 1D solution T = z regardless of the (uniformly hot) shell
    np.testing.assert_allclose(T, mesh.coords[:, 2], atol=1e-9)
