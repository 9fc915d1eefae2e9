"""Surface-rheology projection family: ShellSurfDivV (R_SHELL_SURF_DIV_V,
mm_fill_shell.c:4456), Gamma1DerivBC end closure (fgamma1_deriv_bc), and
the bulk ShearRateProjection (R_SHEAR_RATE)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum, attach_shell_block
from goma_tpu.physics.shell import Gamma1DerivBC, ShellSurfDivV
from goma_tpu.physics.scalar_transport import ShearRateProjection
from goma_tpu.bc.shell_end import shell_end_sidesets
from goma_tpu.fem.equations import PassiveVar
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_shell_surf_div_v_exact_linear():
    """v = (a x, -a y) (planar extension): div_s v on the bottom shell
    (t = x_hat) is exactly a."""
    a = 0.7
    mesh = rectangle_mesh(6, 3, elem="QUAD9")
    bi = attach_shell_block(mesh, "bottom", "rheo")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [[PassiveVar("velocity", 2, "Q2")],
           [ShellSurfDivV(interp="Q2"), PassiveVar("velocity", 2, "Q2")]]
    prob = Problem(mesh, eqs, [{}, {}])
    prob.add_dirichlet("all", "velocity", 0, lambda c: a * c[:, 0])
    prob.add_dirichlet("all", "velocity", 1, lambda c: -a * c[:, 1])
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    g1 = prob.get_nodal_field(res.x, "surf_div_v", 0)
    sn = np.unique(mesh.blocks[bi].conn)
    np.testing.assert_allclose(g1[sn], a, atol=1e-9)


def test_gamma1_deriv_symm_end():
    """Quadratic velocity -> linear gamma1; with surface diffusion the
    symmetry end closure dgamma1/ds = 0 flattens the projected field at
    the closed end while the interior slope survives."""
    a = 1.0
    mesh = rectangle_mesh(10, 3, elem="QUAD9")
    bi = attach_shell_block(mesh, "bottom", "rheo")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [[PassiveVar("velocity", 2, "Q2")],
           [ShellSurfDivV(interp="Q2"), PassiveVar("velocity", 2, "Q2")]]
    prob = Problem(mesh, eqs, [{}, {"surf_div_diff": 0.05}])
    prob.add_dirichlet("all", "velocity", 0, lambda c: a * c[:, 0] ** 2)
    prob.add_dirichlet("all", "velocity", 1, 0.0)
    ends = shell_end_sidesets(mesh, bi, prefix="rheo_end")
    prob.add_face_kernel(ends[1], Gamma1DerivBC(g=0.0, penalty=1e6))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-9, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    g1 = prob.get_nodal_field(res.x, "surf_div_v", 0)
    sn = np.unique(mesh.blocks[bi].conn)
    c = mesh.coords
    order = np.argsort(c[sn, 0])
    vals = g1[sn][order]
    xs = c[sn, 0][order]
    # end slope ~ 0 at x=1 (symmetry closure), interior slope ~ 2a
    end_slope = (vals[-1] - vals[-2]) / (xs[-1] - xs[-2])
    mid_slope = (vals[len(vals)//2 + 1] - vals[len(vals)//2 - 1]) / (
        xs[len(vals)//2 + 1] - xs[len(vals)//2 - 1])
    assert abs(end_slope) < 0.25 * abs(mid_slope), (end_slope, mid_slope)
    assert abs(mid_slope - 2 * a) < 0.6 * a


def test_shear_rate_projection_couette():
    U = 0.8
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [PassiveVar("velocity", 2, "Q2"),
           ShearRateProjection(interp="Q2")]
    prob = Problem(mesh, eqs, {})
    prob.add_dirichlet("all", "velocity", 0, lambda c: U * c[:, 1])
    prob.add_dirichlet("all", "velocity", 1, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    gd = prob.get_nodal_field(res.x, "shear_rate_proj", 0)
    np.testing.assert_allclose(gd, U, atol=1e-8)


def test_shell_grad_surface_electric_field():
    """SURFACE_ELECTRIC_FIELD via ShellGradBC: bulk current k n.grad V
    drives the shell surface-charge equation; with the exact uniform drive
    and end-pinned charge, qs = (src/(2 Ds)) x (1 - x)."""
    from goma_tpu.physics import Potential
    from goma_tpu.physics.shell import (ShellGradBC, SurfaceCharge,
                                        bulk_normal_current)

    k_el, Ds, V0 = 2.0, 0.5, 3.0
    mesh = rectangle_mesh(8, 4, elem="QUAD9")
    bi = attach_shell_block(mesh, "bottom", "qs_shell")
    eqs = [[Potential(), PassiveVar("surface_charge", 1, "Q2", reg=1e-8)],
           [SurfaceCharge(surf_diff=Ds, interp="Q2")]]
    prob = Problem(mesh, eqs, [{}, {}])
    # bulk: V = V0 * y -> n.grad V at the bottom (n = (0,-1)) = -V0
    mesh.nodesets["allb"] = np.arange(mesh.n_nodes, dtype=np.int32)
    prob.add_dirichlet("allb", "voltage", 0, lambda c: V0 * c[:, 1])
    sn = np.unique(mesh.blocks[bi].conn)
    ends = sn[np.isclose(mesh.coords[sn, 0], 0.0)
              | np.isclose(mesh.coords[sn, 0], 1.0)]
    mesh.nodesets["qs_ends"] = ends.astype(np.int32)
    prob.add_dirichlet("qs_ends", "surface_charge", 0, 0.0)
    # minus sign: the inward bulk current (n.gradV < 0 here) deposits
    # positive charge
    prob.add_face_kernel("bottom", ShellGradBC(
        "surface_charge", bulk_normal_current(k_el), sign=1.0))
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "voltage", 0,
                              V0 * mesh.coords[:, 1])
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=5, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    qs = prob.get_nodal_field(res.x, "surface_charge", 0)
    c = mesh.coords
    src = k_el * V0  # |n.grad V| drive
    exact = src / (2 * Ds) * c[sn, 0] * (1 - c[sn, 0])
    np.testing.assert_allclose(qs[sn], exact, atol=1e-5)
