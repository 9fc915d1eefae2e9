"""Named BC catalog, round 3 breadth: the slip-law family of
``src/mm_ns_bc.c`` — power-law slip (VELO_SLIP_POWER,
fvelo_slip_power_bc:3553), electrokinetic / Helmholtz-Smoluchowski slip
(VELO_SLIP_EK / VELO_STREAMING, fvelo_slip_electrokinetic_bc:2276),
level-set-modulated slip (VELO_SLIP_FILL / VELO_SLIP_LEVEL,
fvelo_slip_level:113), and frictional slip heating (Q_VELO_SLIP).
Each validated against an exact 1D solution.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.bc import (ElectrokineticSlip, LevelSetSlip, NavierSlip,
                         PowerLawSlip, SlipHeating)
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum, Potential
from goma_tpu.physics.level_set import FillEquation
from goma_tpu.solvers import NewtonOptions, NewtonSolver

OPTS = NewtonOptions(max_iter=25, tol_residual=1e-11, linear_solver="direct")


def _couette(mesh, mu, slip_kernel, U_top=1.0):
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": mu})
    prob.add_dirichlet("top", "velocity", 0, U_top)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel("bottom", slip_kernel)
    return prob


def test_power_law_slip_couette():
    """Couette with power-law slip at the bottom: steady balance
    mu (U - u_s)/H = (1/beta) u_s^m gives the slip velocity u_s; the
    profile is linear u(y) = u_s + (U - u_s) y/H. With m=2, beta=1/mu,
    H=U=1: u_s^2 = 1 - u_s, u_s = (sqrt(5)-1)/2."""
    mu = 0.5
    beta = 1.0 / mu
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1.0))
    prob = _couette(mesh, mu, PowerLawSlip(dim=2, beta=beta, m=2.0))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    u_s = (np.sqrt(5.0) - 1.0) / 2.0
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    exact = u_s + (1.0 - u_s) * mesh.coords[:, 1]
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=2e-6)


def test_power_law_slip_reduces_to_navier():
    """m=1 must reproduce the NavierSlip Couette exactly:
    u(y) = U (y + Ls)/(H + Ls), Ls = mu beta."""
    mu, beta = 0.5, 2.0
    Ls = mu * beta
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1.0))
    prob = _couette(mesh, mu, PowerLawSlip(dim=2, beta=beta, m=1.0))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    exact = (mesh.coords[:, 1] + Ls) / (1.0 + Ls)
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-7)


def test_electrokinetic_slip_helmholtz_smoluchowski():
    """Electroosmotic Couette: voltage solved by the Potential equation
    with V(0)=V0, V(L)=0 (uniform E_x = V0/L), EK slip at the bottom wall,
    u=0 at the top. Exact: u_HS = -eps zeta E_x . t / mu with the wall
    tangent; finite-beta wall speed u0 = u_HS/(1 + beta mu / H), linear
    profile u(y) = u0 (1 - y/H)."""
    mu, epsp, zeta, V0, L, H = 0.5, 2.0, -0.25, 3.0, 0.5, 1.0
    beta = 0.05
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, L), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1"),
                          Potential(interp="Q2")],
                   {"rho": 1.0, "mu": mu, "kappa": 1.0})
    prob.add_dirichlet("top", "velocity", 0, 0.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_dirichlet("left", "voltage", 0, V0)
    prob.add_dirichlet("right", "voltage", 0, 0.0)
    prob.add_face_kernel("bottom", ElectrokineticSlip(
        dim=2, permittivity=epsp, zeta=zeta, beta=beta))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    # grad V = (-V0/L, 0); the slip target is defined along the wall
    # tangent t — extract the realized wall speed and check the
    # tangent-invariant magnitude and the linear decay to the top
    Ex = -V0 / L
    u_hs_mag = abs(epsp * zeta * Ex / mu)
    u0_mag = u_hs_mag / (1.0 + beta * mu / H)
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    y = mesh.coords[:, 1]
    mask = ~np.isnan(ux)
    u_bot = ux[mask & np.isclose(y, 0.0)]
    assert np.allclose(np.abs(u_bot), u0_mag, atol=1e-6)
    sgn = np.sign(u_bot[0])
    exact = sgn * u0_mag * (1.0 - y)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-6)


def test_level_set_slip_wet_dry_limits():
    """With the fill field pinned uniformly wet (F >> eps) the kernel must
    reproduce the NavierSlip profile with beta_wet; pinned dry (F << -eps)
    with beta_dry."""
    mu, bw, bd, eps_ls = 0.5, 2.0, 0.02, 0.1
    for F0, beta in ((1.0, bw), (-1.0, bd)):
        mesh = rectangle_mesh(3, 6, elem="QUAD9", xlim=(0, 0.5),
                              ylim=(0, 1.0))
        mesh.nodesets["all"] = np.arange(mesh.coords.shape[0],
                                         dtype=np.int32)
        prob = _couette(mesh, mu, LevelSetSlip(
            dim=2, beta_wet=bw, beta_dry=bd, eps_ls=eps_ls))
        prob.equations[0].append(FillEquation(interp="Q2", transient=False,
                                           supg=0.0))
        prob.add_dirichlet("all", "fill", 0, F0)
        prob.finalize()
        res = NewtonSolver(prob, OPTS).solve(
            np.zeros(prob.dofmap.n_dof), prob.base_params())
        assert res.converged
        Ls = mu * beta
        ux = prob.get_nodal_field(res.x, "velocity", 0)
        exact = (mesh.coords[:, 1] + Ls) / (1.0 + Ls)
        mask = ~np.isnan(ux)
        np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-7)


def test_slip_heating_couette():
    """NavierSlip Couette + Q_VELO_SLIP frictional heating at the bottom,
    T=0 at the top, insulated sides: incoming flux q0 = (1/beta) u_s^2
    with u_s = U Ls/(H+Ls), steady conduction T(y) = q0 (H - y)/k."""
    mu, beta, k = 0.5, 2.0, 0.8
    Ls = mu * beta
    u_s = Ls / (1.0 + Ls)
    q0 = u_s * u_s / beta
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1.0))
    prob = _couette(mesh, mu, NavierSlip(dim=2, beta=beta))
    prob.equations[0].append(Energy(interp="Q2", transient=False))
    prob.materials[0]["k"] = k
    prob.materials[0]["Cp"] = 1.0
    prob.add_dirichlet("top", "temperature", 0, 0.0)
    prob.add_face_kernel("bottom", SlipHeating(dim=2, beta=beta))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    exact = q0 * (1.0 - mesh.coords[:, 1]) / k
    mask = ~np.isnan(T)
    np.testing.assert_allclose(T[mask], exact[mask], atol=1e-7)
