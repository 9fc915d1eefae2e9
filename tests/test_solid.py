"""Real-solid mechanics (TOTAL_ALE split): static elasticity, dynamics via
the first-order velocity split, and the mesh<->solid tie.

Validations:
- plane-strain uniaxial stretch matches the exact lateral-contraction field;
- traction-loaded bar matches delta = t L / (lam + 2 mu) in constrained mode;
- axial vibration of a clamped-free bar reproduces the analytic fundamental
  mode evolution (P-wave speed, first-order split == Newmark(1/4,1/2));
- TOTAL_ALE tie makes the mesh follow the solid at material boundaries;
- AD Jacobians match finite differences.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    EllipticMesh,
    RealSolid,
    SolidKinematics,
    SolidTraction,
    tie_mesh_to_solid,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check

MU, LAM = 3.0, 2.0


def test_plane_strain_uniaxial_stretch():
    """Clamp x=0 face (x only), pull x=L face to delta; lateral faces free.
    Exact linear-elastic plane-strain solution: d_x = delta x/L,
    d_y = -nu_eff delta/L (y - y_mid) with nu_eff = lam/(lam + 2 mu)."""
    L, delta = 1.0, 0.02
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(
        mesh,
        [RealSolid(2, interp="Q2", model="linear")],
        {"lame_mu": MU, "lame_lambda": LAM},
    )
    prob.add_dirichlet("left", "solid_displacement", 0, 0.0)
    prob.add_dirichlet("right", "solid_displacement", 0, delta)
    # pin rigid-body y at the midline nodes of left/right faces
    mid = np.where(
        (np.isclose(mesh.coords[:, 1], 0.5))
        & (np.isclose(mesh.coords[:, 0] % L, 0.0) | np.isclose(mesh.coords[:, 0], L))
    )[0]
    prob.mesh.nodesets["pin"] = mid
    prob.add_dirichlet("pin", "solid_displacement", 1, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, "solid_displacement", 0)
    dy = prob.get_nodal_field(res.x, "solid_displacement", 1)
    nu_eff = LAM / (LAM + 2.0 * MU)
    np.testing.assert_allclose(dx, delta * mesh.coords[:, 0] / L, atol=1e-10)
    np.testing.assert_allclose(
        dy, -nu_eff * delta / L * (mesh.coords[:, 1] - 0.5), atol=1e-10)


def test_traction_loaded_bar():
    """Constrained (d_y = 0 everywhere) bar pulled by traction t at x=L:
    1D solution d_x = t x / (lam + 2 mu)."""
    t = 0.5
    mesh = rectangle_mesh(6, 2, elem="QUAD9")
    prob = Problem(
        mesh,
        [RealSolid(2, interp="Q2", model="linear")],
        {"lame_mu": MU, "lame_lambda": LAM},
    )
    prob.add_dirichlet("left", "solid_displacement", 0, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(f"sideset:{ns}", "solid_displacement", 1, 0.0)
    prob.add_dirichlet("sideset:top", "solid_displacement", 1, 0.0)
    # interior y pins: constrain the whole field to keep the problem 1D
    prob.mesh.nodesets["all"] = np.arange(mesh.n_nodes)
    prob.add_dirichlet("all", "solid_displacement", 1, 0.0)
    prob.add_face_kernel("right", SolidTraction(2, [t, 0.0]))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, "solid_displacement", 0)
    np.testing.assert_allclose(dx, t * mesh.coords[:, 0] / (LAM + 2 * MU),
                               atol=1e-9)


def test_bar_axial_vibration():
    """Clamped-free bar, initial displacement = fundamental mode shape
    A sin(pi x / 2L); tip follows A cos(omega t), omega = (pi/2L) c_p,
    c_p = sqrt((lam + 2 mu)/rho). Integrated with theta=1/2 (== Newmark
    1/4, 1/2 on this linear problem)."""
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    rho, A, L = 2.0, 1e-3, 1.0
    cp = np.sqrt((LAM + 2 * MU) / rho)
    omega = np.pi / (2 * L) * cp
    mesh = rectangle_mesh(10, 1, elem="QUAD9")
    prob = Problem(
        mesh,
        [
            RealSolid(2, interp="Q2", model="linear", dynamic=True),
            SolidKinematics(2, interp="Q2"),
        ],
        {"lame_mu": MU, "lame_lambda": LAM, "solid_rho": rho},
    )
    prob.add_dirichlet("left", "solid_displacement", 0, 0.0)
    prob.add_dirichlet("left", "solid_velocity", 0, 0.0)
    prob.mesh.nodesets["all"] = np.arange(mesh.n_nodes)
    prob.add_dirichlet("all", "solid_displacement", 1, 0.0)
    prob.add_dirichlet("all", "solid_velocity", 1, 0.0)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "solid_displacement", 0,
                              lambda X: A * np.sin(np.pi * X[:, 0] / (2 * L)))
    t_end = 0.6 * 2 * np.pi / omega
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=6, tol_residual=1e-12, linear_solver="direct"),
        TimeOptions(dt0=t_end / 240, t_end=t_end, adapt=False, theta=0.5,
                    bootstrap_be=False),
    )
    res = ts.run(jnp.asarray(x0), prob.base_params())
    dx = prob.get_nodal_field(res.x, "solid_displacement", 0)
    tip = np.where(np.isclose(mesh.coords[:, 0], L))[0]
    got = dx[tip].mean()
    expect = A * np.cos(omega * res.t)
    np.testing.assert_allclose(got, expect, atol=2e-2 * A)


def test_total_ale_tie_and_jacobian():
    """Solid block stretched nonlinearly; mesh displacement tied to the solid
    on the right boundary, elliptic smoothing inside."""
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(
        mesh,
        [
            RealSolid(2, interp="Q1", model="nonlinear"),
            EllipticMesh(2, interp="Q1"),
        ],
        {"lame_mu": MU, "lame_lambda": LAM},
    )
    delta = 0.05
    prob.add_dirichlet("left", "solid_displacement", 0, 0.0)
    prob.add_dirichlet("left", "solid_displacement", 1, 0.0)
    prob.add_dirichlet("right", "solid_displacement", 0, delta)
    prob.add_dirichlet("right", "solid_displacement", 1, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 0, 0.0)
    prob.add_dirichlet("left", "mesh_displacement", 1, 0.0)
    tie_mesh_to_solid(prob, "right", 2)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    for c in range(2):
        dm = prob.get_nodal_field(res.x, "mesh_displacement", c)
        ds = prob.get_nodal_field(res.x, "solid_displacement", c)
        np.testing.assert_allclose(dm[mesh.nodesets["right"]],
                                   ds[mesh.nodesets["right"]], atol=1e-10)
    # mesh interior follows smoothly (monotone in x, bounded by tie value)
    dmx = prob.get_nodal_field(res.x, "mesh_displacement", 0)
    assert dmx.max() <= delta + 1e-9 and dmx.min() >= -1e-9

    rng = np.random.RandomState(0)
    x = np.asarray(res.x) + 1e-3 * rng.randn(prob.dofmap.n_dof)
    chk = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=10)
    assert chk.ok, chk.report()
