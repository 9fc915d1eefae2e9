"""Overset (fictitious-domain) Lagrange-multiplier coupling.

Parity: reference overlapping-grid contact (src/bc_contact.c apply_contact_bc,
src/mm_augc_util.c create_overlap_acs): an immersed boundary not conforming
to the background fluid mesh enforces no-slip there through multipliers that
feed reaction forces back to the fluid.

Validation: Couette channel with an immersed line at y = y_c moving at U_s.
The exact solution is piecewise linear (u = 0 at y=0, U_s at y_c, U_top at
1); the P0 multipliers enforce segment-average no-slip (mortar sense), so
the profile matches to the mortar averaging error and each multiplier
equals the shear-traction jump across the line.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import polyline_block, rectangle_mesh
from goma_tpu.physics import Continuity, Momentum, OversetLM, OversetNoSlip
from goma_tpu.solvers import NewtonOptions, NewtonSolver

OPTS = NewtonOptions(max_iter=8, tol_residual=1e-11, linear_solver="direct")


def couette_overset(y_c, ny, U_s=0.4, U_top=1.0, mu=0.7, nseg=7):
    mesh = rectangle_mesh(4, ny, elem="QUAD9", xlim=(0, 0.8), ylim=(0, 1))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    line = np.stack([np.linspace(0, 0.8, nseg + 1),
                     np.full(nseg + 1, y_c)], axis=1)
    bi = polyline_block(mesh, line, name="wall")
    eqs = [
        [Momentum(dim=2, interp="Q2", transient=False, convection=False),
         Continuity(interp="Q1")],
        [OversetLM(dim=2)],
    ]
    prob = Problem(mesh, eqs, [{"rho": 1.0, "mu": mu}, {}])
    prob.add_dirichlet("top", "velocity", 0, U_top)
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_overset(bi, 0, OversetNoSlip(
        dim=2, u_target=lambda x, params: jnp.asarray([U_s, 0.0])))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged, res.summary()
    return mesh, prob, res


def test_overset_couette_aligned_exact():
    U_s, U_top, mu, y_c = 0.4, 1.0, 0.7, 0.3
    mesh, prob, res = couette_overset(y_c=y_c, ny=10, U_s=U_s, U_top=U_top, mu=mu)
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    y = mesh.coords[:, 1]
    exact = np.where(y <= y_c, U_s * y / y_c,
                     U_s + (U_top - U_s) * (y - y_c) / (1 - y_c))
    mask = ~np.isnan(ux)
    # P0 mortar: segment-average constraints -> O(1e-4) wiggle at this size
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-3)

    # multiplier = shear-traction jump across the immersed line:
    # mu du/dy above - mu du/dy below
    tau_jump = mu * ((U_top - U_s) / (1 - y_c) - U_s / y_c)
    bd = prob.dofmap.blocks[1]
    s = bd.slot("lm")
    lam_x = res.x[bd.gather[:, s.start]]  # x-component, one per segment
    # P0 multipliers checkerboard a little; the mean traction (the physical
    # drag per unit length) is exact, each segment within ~10%
    np.testing.assert_allclose(lam_x.mean(), tau_jump, rtol=1e-4)
    np.testing.assert_allclose(lam_x, tau_jump, rtol=0.12)


def test_overset_couette_nonaligned():
    U_s, U_top, y_c = 0.4, 1.0, 0.37
    mesh, prob, res = couette_overset(y_c=y_c, ny=8, U_s=U_s, U_top=U_top)
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    y = mesh.coords[:, 1]
    exact = np.where(y <= y_c, U_s * y / y_c,
                     U_s + (U_top - U_s) * (y - y_c) / (1 - y_c))
    # away from the cut row the profile is accurate
    mask = ~np.isnan(ux) & (np.abs(y - y_c) > 0.25)
    err = np.max(np.abs(ux[mask] - exact[mask]))
    assert err < 0.02, err


def test_overset_fsi_elastic_wall():
    """Two-way flexible-solid overset (BAAIJENS pair): an elastic strip
    overlaps the fluid mesh, its top face immersed in a Couette flow.
    Steady: d_dot = 0 means the face acts as a no-slip wall, and the
    multipliers transfer the fluid shear to the solid -> pure-shear
    deflection d_x(y) = tau y / mu_L with tau = mu_f U / (1 - y_c)."""
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.mesh.immersed import merge_mesh
    from goma_tpu.physics import RealSolid, attach_shell_block
    from goma_tpu.physics.overset import OversetFSI

    U, mu_f, mu_L, y_c = 1.0, 0.7, 5.0, 0.3
    fluid = rectangle_mesh(4, 10, elem="QUAD9", xlim=(0, 0.8), ylim=(0, 1))
    fluid.nodesets["pin"] = np.array([0], dtype=np.int32)
    solid = rectangle_mesh(4, 3, elem="QUAD9", xlim=(0, 0.8), ylim=(0, y_c))
    mesh = fluid
    sbi = merge_mesh(mesh, solid, prefix="s")
    bbi = attach_shell_block(mesh, "s:top", "ifc")
    from goma_tpu.fem import Problem
    from goma_tpu.physics import Continuity, Momentum, OversetLM

    eqs = [
        [Momentum(dim=2, interp="Q2", transient=False, convection=False),
         Continuity(interp="Q1")],
        [RealSolid(dim=2, interp="Q2", model="linear")],
        [OversetLM(dim=2)],
    ]
    mats = [{"rho": 1.0, "mu": mu_f},
            {"lame_mu": mu_L, "lame_lambda": 2.0, "solid_rho": 1.0}, {}]
    prob = Problem(mesh, eqs, mats)
    prob.add_dirichlet("top", "velocity", 0, U)
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    for c in (0, 1):
        prob.add_dirichlet("s:bottom", "solid_displacement", c, 0.0)
    # suppress the free-side bending mode so the strip is in PURE shear
    # (otherwise the stubby strip legitimately deflects more than tau y/mu)
    mesh.nodesets["s:all"] = np.unique(mesh.blocks[sbi].conn)
    prob.add_dirichlet("s:all", "solid_displacement", 1, 0.0)
    prob.add_overset(bbi, 0, OversetFSI(dim=2), solid=(sbi, "s:top"))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    # fluid: no-slip held at the immersed face
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    y = mesh.coords[:, 1]
    fl = ~np.isnan(ux) & (np.abs(y - y_c) < 1e-9)
    assert np.nanmax(np.abs(ux[fl])) < 5e-3

    # solid: pure shear deflection from the transferred fluid traction
    tau = mu_f * U / (1 - y_c)
    dx = prob.get_nodal_field(res.x, "solid_displacement", 0)
    snodes = mesh.nodesets["s:top"]
    d_top = np.nanmean(dx[snodes])
    np.testing.assert_allclose(d_top, tau * y_c / mu_L, rtol=0.05)
    # linear profile through the strip thickness
    sl = mesh.nodesets["s:left"]
    ys = mesh.coords[sl, 1]
    np.testing.assert_allclose(dx[sl], tau * ys / mu_L, atol=0.05 * tau * y_c / mu_L)


def test_overset_moving_boundary_refinalize():
    """Moving immersed boundaries: update the bar nodes' coordinates and
    re-finalize — the host relocalization (the reference recomputes its
    point-in-element search every assembly) rebuilds the coupling. The
    Couette kink follows the wall."""
    U_s, U_top = 0.0, 1.0
    mesh, prob, res = couette_overset(y_c=0.31, ny=10, U_s=U_s, U_top=U_top)
    ux1 = prob.get_nodal_field(res.x, "velocity", 0)
    # move the immersed wall up and re-finalize the SAME problem
    wall = mesh.nodesets["wall"]
    mesh.coords[wall, 1] = 0.52
    prob.finalize()
    res2 = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                          prob.base_params())
    assert res2.converged
    ux2 = prob.get_nodal_field(res2.x, "velocity", 0)
    y = mesh.coords[:, 1]
    # at y = 0.45 (below the new wall, above the old): before the move the
    # flow is already substantial; after, it is locked to ~U_s = 0
    probe = ~np.isnan(ux2) & (np.abs(y - 0.45) < 0.03) & (np.arange(len(y)) < wall.min())
    assert np.nanmax(np.abs(ux2[probe])) < 0.05
    assert np.nanmax(np.abs(ux1[probe])) > 0.15
