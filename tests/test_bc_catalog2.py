"""BC catalog round 2: exact-solution tests for the kernels that the
round-1 parity table claimed without direct coverage (QRAD, YFLUX_MTC,
HOR flux, CAP_ENDFORCE, parametric Dirichlet / PRESSURE_USER)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_qrad_radiative_equilibrium():
    """QRAD on an insulated bar: steady state is the radiative equilibrium
    T = T_s everywhere (nonlinear T^4 exercised from a cold start)."""
    from goma_tpu.bc import RadiativeHeatFlux

    mesh = rectangle_mesh(4, 2, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 1.0})
    prob.add_face_kernel("right", RadiativeHeatFlux(h=0.0, T_s=2.0, eps=0.5,
                                                    sigB=1.0))
    prob.add_dirichlet("left", "temperature", 0, 2.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, linear_solver="direct")
                       ).solve(np.full(prob.dofmap.n_dof, 0.5),
                               prob.base_params())
    assert res.converged
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("temperature")]
    np.testing.assert_allclose(res.x[d[d >= 0]], 2.0, atol=1e-9)
    # quadratic tail proves the exact T^4 Jacobian
    l2 = [r[1] for r in res.res_norms if r[1] > 0]
    assert l2[-1] < 1e-12 * l2[0]


def test_yflux_mtc_balance():
    """YFLUX mass-transfer coefficient: 1D diffusion with c=c0 on the left
    and k_mtc(c - c_inf) on the right. Exact: linear profile with
    c(right) from the Robin balance D (c0-cR)/L = k (cR - c_inf)."""
    from goma_tpu.bc import MassTransferFlux
    from goma_tpu.physics import Species

    D, k_mtc, c0, c_inf, L = 0.8, 2.0, 1.0, 0.2, 1.0
    mesh = rectangle_mesh(6, 2, elem="QUAD9")
    prob = Problem(mesh, [Species(n_species=1, interp="Q2", transient=False,
                                  convection=False)], {"diffusivity": D})
    prob.add_dirichlet("left", "species", 0, c0)
    prob.add_face_kernel("right", MassTransferFlux(k_mtc=k_mtc, c_inf=c_inf))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    cR = (D / L * c0 + k_mtc * c_inf) / (D / L + k_mtc)
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("species")]
    ok = d >= 0
    exact = c0 + (cR - c0) * mesh.coords[ok, 0] / L
    np.testing.assert_allclose(res.x[d[ok]], exact, atol=1e-9)


def test_hor_flux_runs_and_couples_potential():
    """HOR surface kinetics on a species+potential pair: converges and the
    flux sign follows (V - Phi - U0)."""
    from goma_tpu.physics import Species
    from goma_tpu.physics.electro import HORFlux, Potential

    mesh = rectangle_mesh(4, 2, elem="QUAD9")
    prob = Problem(
        mesh,
        [Species(n_species=1, interp="Q2", transient=False, convection=False),
         Potential(interp="Q2")],
        {"diffusivity": 1.0, "kappa": 1.0})
    prob.add_dirichlet("left", "species", 0, 1.0)
    prob.add_dirichlet("left", "voltage", 0, 0.0)
    prob.add_dirichlet("right", "voltage", 0, 0.05)
    prob.add_face_kernel("right", HORFlux(
        ai0=1.0, H=1.0, n=1.0, alpha_a=0.5, alpha_c=0.5, U0=0.0, beta=1.0,
        cref=1.0, V=0.3))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=10, linear_solver="direct")
                       ).solve(np.full(prob.dofmap.n_dof, 0.5),
                               prob.base_params())
    assert res.converged
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("species")]
    c = res.x[d[d >= 0]]
    assert np.all(np.isfinite(c))
    # V - Phi - U0 > 0 consumes species at the right: c decreases rightward
    right = mesh.coords[d >= 0][:, 0] > 1 - 1e-9
    left = mesh.coords[d >= 0][:, 0] < 1e-9
    assert c[right].mean() < c[left].mean()


def test_cap_endforce_point_load():
    """CAP_ENDFORCE: the surface-tension endpoint force sigma*m lands as a
    consistent nodal load on the momentum rows of the contact-line node."""
    from goma_tpu.bc.fluid import cap_end_force
    from goma_tpu.physics import Continuity, Momentum

    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    mesh.nodesets["cl"] = np.array([int(np.argmin(
        np.abs(mesh.coords[:, 0] - 1.0) + np.abs(mesh.coords[:, 1] - 1.0)))],
        dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    sigma = 0.7
    prob.add_point_load("cl", "velocity", cap_end_force((1.0, 1.0), sigma))
    prob.finalize()
    x = jnp.zeros(prob.dofmap.n_dof, dtype=prob.dtype)
    R, _ = prob._assemble(x, prob.base_params())
    dm = prob.dofmap
    node = int(mesh.nodesets["cl"][0])
    dx_ = dm.dof_of_node_svar[node, dm.svar("velocity", 0)]
    dy_ = dm.dof_of_node_svar[node, dm.svar("velocity", 1)]
    m = np.array([1.0, 1.0]) / np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(R)[[dx_, dy_]], -sigma * m,
                               rtol=1e-12)
    # and nowhere else
    mask = np.ones(prob.dofmap.n_dof, bool)
    mask[[dx_, dy_]] = False
    np.testing.assert_allclose(np.asarray(R)[mask], 0.0, atol=1e-14)


def test_parametric_dirichlet_pressure_user():
    """UVARY/PRESSURE_USER-style parametric BCs: a Dirichlet value callable
    f(coords, params) re-evaluates inside assembly (continuation-ready) and
    a callable FlowPressure p0 tracks params."""
    from goma_tpu.bc import FlowPressure
    from goma_tpu.physics import Continuity, Momentum

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 1.0})
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    # UVARY: u_top = A * 4 x (1-x) with A a live parameter
    prob.add_dirichlet("top", "velocity", 0,
                       lambda X, params: params["A"] * 4.0 * X[:, 0]
                       * (1.0 - X[:, 0]))
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    dm = prob.dofmap
    top_mid = int(np.argmin(np.abs(mesh.coords[:, 0] - 0.5)
                            + np.abs(mesh.coords[:, 1] - 1.0)))
    d = dm.dof_of_node_svar[top_mid, dm.svar("velocity", 0)]
    for A in (0.5, 2.0):
        params = prob.base_params(A=jnp.asarray(A, dtype=prob.dtype))
        res = NewtonSolver(prob, NewtonOptions(max_iter=8,
                                               linear_solver="direct")
                           ).solve(np.zeros(prob.dofmap.n_dof), params)
        assert res.converged
        np.testing.assert_allclose(res.x[d], A, rtol=1e-10)


def test_velo_tangent_solid_moving_wall():
    """VELO_TANGENT_SOLID: Navier slip against a MOVING substrate u_wall:
    Couette with stationary top lid and wall speed Uw at the slipping
    bottom. Exact: u(y) = (Uw Ls + (stationary top) terms) — linear profile
    u(y) = Uw + (0 - Uw)(y + Ls)/(H + Ls) reversed: solve from the slip law
    mu u'(0) = (1/beta)(u(0) - Uw) with u(H) = 0."""
    from goma_tpu.bc import NavierSlip
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.mesh import rectangle_mesh

    H, Uw, mu, beta = 1.0, 1.0, 0.5, 2.0
    Ls = mu * beta
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": mu})
    prob.add_dirichlet("top", "velocity", 0, 0.0)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel("bottom", NavierSlip(dim=2, beta=beta,
                                              u_wall=(Uw, 0.0)))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    # linear u(y)=a+by with u(H)=0 and mu b = (1/beta)(a - Uw):
    # b = -a/H -> a (1/(beta) + mu/H) = Uw/beta -> a = Uw H/(H + Ls)
    a = Uw * H / (H + Ls)
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    exact = a * (1.0 - mesh.coords[:, 1] / H)
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-8)
