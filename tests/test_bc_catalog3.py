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


def test_ve_stress_gradient_dirichlet_family():
    """S11/S12/S22 (per-mode stress Dirichlets, reference S11_BC..S33_7_BC)
    and G11..G22 (velocity-gradient Dirichlets, G11_BC..G33_BC) are plain
    ``add_dirichlet`` on the ``stress{m}`` / ``velocity_gradient`` fields;
    U_VES*_PARABOLA is the same with a coords-callable value. Imposing the
    exact simple-shear values at the inflow must leave the exact solution
    intact (and the imposed rows must hold exactly)."""
    from goma_tpu.physics import (VelocityGradientProjection, VEStress)

    lam, mu_p, mu_s, V = 0.5, 1.0, 0.5, 1.0
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [
        Momentum(dim=2, interp="Q2", transient=False, ve_stress_modes=1,
                 devss_mu=mu_p),
        Continuity(interp="Q1"),
        VEStress(0, dim=2, lam=lam, mu_p=mu_p, model="oldroyd_b",
                 interp="Q1", transient=False),
        VelocityGradientProjection(dim=2, interp="Q1"),
    ], {"rho": 0.0, "mu": mu_s})
    shear = lambda c: V * c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, shear)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    # exact simple-shear VE state: S12 = mu_p V, S11 = 2 lam mu_p V^2,
    # S22 = 0; G = [[0, V], [0, 0]]
    s11, s12 = 2 * lam * mu_p * V * V, mu_p * V
    # U_VES..._PARABOLA machinery: coords-callable stress value (constant
    # here — the exact state is uniform)
    prob.add_dirichlet("left", "stress0", 0, lambda c: s11 + 0.0 * c[:, 0])
    prob.add_dirichlet("left", "stress0", 1, s12)
    prob.add_dirichlet("left", "stress0", 2, 0.0)
    prob.add_dirichlet("left", "velocity_gradient", 0, 0.0)
    prob.add_dirichlet("left", "velocity_gradient", 1, V)
    prob.add_dirichlet("left", "velocity_gradient", 2, 0.0)
    prob.add_dirichlet("left", "velocity_gradient", 3, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=15, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    S11 = prob.get_nodal_field(res.x, "stress0", 0)
    S12 = prob.get_nodal_field(res.x, "stress0", 1)
    S22 = prob.get_nodal_field(res.x, "stress0", 2)
    G12 = prob.get_nodal_field(res.x, "velocity_gradient", 1)
    np.testing.assert_allclose(S11[~np.isnan(S11)], s11, atol=1e-7)
    np.testing.assert_allclose(S12[~np.isnan(S12)], s12, atol=1e-7)
    np.testing.assert_allclose(S22[~np.isnan(S22)], 0.0, atol=1e-7)
    np.testing.assert_allclose(G12[~np.isnan(G12)], V, atol=1e-7)


def test_gd_circ_inverse_parab_offset():
    """GD_CIRC / GD_INVERSE / GD_PARAB_OFFSET factor kinds
    (src/bc_colloc.c:2085,2121,2144) evaluate per the reference formulas."""
    from goma_tpu.input.deck import build_gd_value

    coords = np.stack([np.linspace(1.0, 3.0, 5),
                       np.linspace(0.0, 1.0, 5)], axis=1)
    x = coords[:, 0]
    v = build_gd_value({"gd": [{"fn": "inverse", "var": "x",
                                "c": [2.0, 3.0]}]})(coords, {})
    np.testing.assert_allclose(np.asarray(v), 2.0 + 3.0 / x, rtol=1e-12)
    v = build_gd_value({"gd": [{"fn": "circ", "var": "x",
                                "c": [0.5, 2.0, 4.0]}]})(coords, {})
    np.testing.assert_allclose(np.asarray(v), 4.0 * (x - 2.0) ** 2 - 0.25,
                               rtol=1e-12)
    v = build_gd_value({"gd": [{"fn": "parab_offset", "var": "x",
                                "c": [1.0, 2.0, 3.0, 0.5]}]})(coords, {})
    np.testing.assert_allclose(
        np.asarray(v), 1.0 + 2.0 * (x - 0.5) + 3.0 * (x - 0.5) ** 2,
        rtol=1e-12)


def test_qvapor_slab_exact():
    """Q_VAPOR on the top of a conducting slab, T=T0 at the bottom: steady
    1D balance k (T0 - T_top)/H = q_vapor(T_top) — the Kanouff cubic —
    solved on the host by bisection; the FEM profile must be linear through
    (T0, T_top)."""
    from goma_tpu.bc import QVaporFlux
    from goma_tpu.physics.level_set import vapor_cool

    T0, T_boil, k, H = 400.0, 300.0, 50.0, 1.0
    qv = vapor_cool(T_boil, T_scale=1.0, q_scale=1e-3)

    def bal(Tt):
        return k * (T0 - Tt) / H - float(qv(jnp.asarray(Tt)))

    lo, hi = T_boil, T0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if bal(mid) > 0:
            lo = mid
        else:
            hi = mid
    T_top = 0.5 * (lo + hi)
    assert T_boil < T_top < T0

    mesh = rectangle_mesh(3, 6, elem="QUAD9", xlim=(0, 0.5), ylim=(0, H))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)],
                   {"k": k, "rho": 1.0, "Cp": 1.0})
    prob.add_dirichlet("bottom", "temperature", 0, T0)
    prob.add_face_kernel("top", QVaporFlux(T_boil=T_boil, q_scale=1e-3))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(
        np.full(prob.dofmap.n_dof, T0), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    exact = T0 + (T_top - T0) * mesh.coords[:, 1] / H
    mask = ~np.isnan(T)
    np.testing.assert_allclose(T[mask], exact[mask], rtol=2e-7)


def test_laser_weld_energy_balance():
    """Q_LASER_WELD Gaussian beam on the top, QCONV h(T - 0) on the bottom,
    insulated sides: at steady state the heat convected out of the bottom
    equals the laser power absorbed on top (global energy balance); the
    absorbed power matches the closed-form 1D Gaussian integral (erf)."""
    from math import erf, sqrt, pi, log

    from goma_tpu.bc import ConvectiveHeatFlux, LaserWeldFlux
    from goma_tpu.post import sideset_integral

    P, w, xc, h, L = 10.0, 0.3, 1.0, 5.0, 2.0
    mesh = rectangle_mesh(16, 6, elem="QUAD9", xlim=(0, L), ylim=(0, 0.5))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)],
                   {"k": 1.0, "rho": 1.0, "Cp": 1.0})
    prob.add_face_kernel("top", LaserWeldFlux(power=P, radius=w,
                                              center=(xc, 0.5)))
    prob.add_face_kernel("bottom", ConvectiveHeatFlux(h=h, T_inf=0.0))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    q_bot = sideset_integral(
        prob, "bottom",
        lambda sfv, mat, params: h * sfv.val["temperature"][:, 0])
    out = float(q_bot(res.x, prob.base_params()))
    # analytic absorbed power: int P 2 R exp(-R (x-xc)^2/w^2) dx over [0, L]
    # int_0^L exp(-a^2 (x-xc)^2) dx = sqrt(pi)/(2a) (erf(a(L-xc)) + erf(a xc))
    R = -log(1.0 - 0.4522)
    a = sqrt(R) / w
    p_in = P * 2.0 * R * (sqrt(pi) / (2.0 * a)) * (
        erf(a * (L - xc)) + erf(a * xc))
    np.testing.assert_allclose(out, p_in, rtol=1e-6)


def test_ls_embedded_dirichlet_temperature():
    """LS_T: fill pinned to the linear distance field x - 0.5, T=0 / T=3
    at the walls, embedded T=2 at the zero contour: away from the diffuse
    band the exact profile is piecewise linear 0->2 on [0, 0.5] and
    2->3 on [0.5, 1]."""
    from goma_tpu.physics import LSEmbeddedDirichlet

    mesh = rectangle_mesh(32, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.1))
    mesh.nodesets["all"] = np.arange(mesh.coords.shape[0], dtype=np.int32)
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False),
                          FillEquation(interp="Q2", transient=False,
                                       supg=0.0),
                          LSEmbeddedDirichlet("temperature", 2.0,
                                              penalty=1e8, interp="Q2")],
                   {"k": 1.0, "rho": 1.0, "Cp": 1.0})
    prob.add_dirichlet("left", "temperature", 0, 0.0)
    prob.add_dirichlet("right", "temperature", 0, 3.0)
    prob.add_dirichlet("all", "fill", 0, lambda c: c[:, 0] - 0.5)
    prob.finalize()
    params = prob.base_params()
    params["ls_eps"] = 0.06
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         params)
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    x = mesh.coords[:, 0]
    # the interface value is met to the penalty tolerance (and held across
    # the diffuse band)
    mid = ~np.isnan(T) & (np.abs(x - 0.5) < 0.04)
    np.testing.assert_allclose(T[mid], 2.0, atol=1e-5)
    # outside the band the solution is pure linear conduction toward each
    # wall value: T proportional to x on the left (through (0,0)) and to
    # (1-x) on the right (through (1,3)); check by two-point ratios
    ok = ~np.isnan(T)
    for xa, xb in ((0.125, 0.25), (0.09375, 0.28125)):
        Ta = T[ok & np.isclose(x, xa)][0]
        Tb = T[ok & np.isclose(x, xb)][0]
        np.testing.assert_allclose(Tb / Ta, xb / xa, rtol=1e-6)
        Tc = T[ok & np.isclose(x, 1 - xa)][0]
        Td = T[ok & np.isclose(x, 1 - xb)][0]
        np.testing.assert_allclose((3 - Td) / (3 - Tc), xb / xa, rtol=1e-6)
    # monotone overall (up to the penalty-scale wiggle inside the band)
    order = np.argsort(x[ok])
    assert np.all(np.diff(T[ok][order]) > -1e-5)


def test_ls_flow_pressure_static_jump():
    """LS_FLOW_PRESSURE: prescribed interface pressure P on a vertical
    embedded boundary in a closed box of still fluid — exact rest state
    with the pressure jump p(+) - p(-) = P across the zero contour."""
    from goma_tpu.physics import LSFlowPressure

    P0 = 2.5
    mesh = rectangle_mesh(24, 6, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.25))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    mesh.nodesets["all"] = np.arange(mesh.coords.shape[0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1"),
                          FillEquation(interp="Q2", transient=False,
                                       supg=0.0),
                          LSFlowPressure(dim=2, p0=P0)],
                   {"rho": 1.0, "mu": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_dirichlet("all", "fill", 0, lambda c: c[:, 0] - 0.5)
    prob.finalize()
    params = prob.base_params()
    params["ls_eps"] = 0.1
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         params)
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    p = prob.get_nodal_field(res.x, "pressure", 0)
    x = mesh.coords[:, 0]
    # spurious currents at the diffuse jump are the usual Q2/Q1-CSF
    # artifact (the pressure space cannot represent the cosine ramp
    # exactly); they must stay tiny relative to P0/mu
    assert np.nanmax(np.abs(u)) < 1e-3
    left = ~np.isnan(p) & (x < 0.5 - 0.12)
    right = ~np.isnan(p) & (x > 0.5 + 0.12)
    np.testing.assert_allclose(p[left], 0.0, atol=5e-3)
    np.testing.assert_allclose(np.nanmean(p[right]) - np.nanmean(p[left]),
                               P0, rtol=1e-3)


def test_rep_force_plane_equilibrium():
    """REP_FORCE: an elastic column fixed at the top with wall repulsion
    -pr/d^m at the bottom (plane at y = -d0). Laterally constrained
    uniaxial strain: the bottom rises by u_b solving
    M u_b / H = pr / (d0 + u_b)^m, M = lam + 2 G; linear profile."""
    from goma_tpu.bc.wetting import RepulsiveForce
    from goma_tpu.physics import LinearElasticMesh

    G, lam, pr, m, d0, H = 1.0, 1.0, 0.05, 2.0, 0.5, 1.0
    M = lam + 2.0 * G

    def bal(ub):
        return M * ub / H - pr / (d0 + ub) ** m

    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        (lo, hi) = (mid, hi) if bal(mid) < 0 else (lo, mid)
    u_b = 0.5 * (lo + hi)

    mesh = rectangle_mesh(2, 8, elem="QUAD9", xlim=(0, 0.25), ylim=(0, H))
    prob = Problem(mesh, [LinearElasticMesh(dim=2, interp="Q2")],
                   {"mesh_shear_modulus": G, "mesh_lambda": lam})
    prob.add_dirichlet("top", "mesh_displacement", 1, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
    prob.add_face_kernel("bottom", RepulsiveForce(
        dim=2, pr=pr, repexp=m, plane=(0.0, 1.0, 0.0, d0)))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    uy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    exact = u_b * (1.0 - mesh.coords[:, 1] / H)
    mask = ~np.isnan(uy)
    np.testing.assert_allclose(uy[mask], exact[mask], atol=2e-6)
    assert u_b > 1e-3  # the repulsion actually moved the boundary


def test_residence_time_plug_flow():
    """RESTIME: plug flow U through a channel, tau = 0 at the inlet:
    exact tau(x) = x/U (the SUPG weak form reproduces the linear exact
    solution exactly on Q1)."""
    from goma_tpu.physics import ResidenceTime

    U = 2.0
    mesh = rectangle_mesh(8, 3, elem="QUAD9", xlim=(0, 2.0), ylim=(0, 0.5))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1"),
                          ResidenceTime(interp="Q1", supg=0.5)],
                   {"rho": 1.0, "mu": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, U)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_dirichlet("left", "restime", 0, 0.0)
    prob.finalize()
    # pure advection has no tau-rows at u = 0: start from the plug-flow
    # initial condition (the usual deck initial guess)
    x0 = np.asarray(prob.set_nodal_field(
        np.zeros(prob.dofmap.n_dof), "velocity", 0,
        np.full(mesh.coords.shape[0], U)))
    res = NewtonSolver(prob, OPTS).solve(x0, prob.base_params())
    assert res.converged
    tau = prob.get_nodal_field(res.x, "restime", 0)
    exact = mesh.coords[:, 0] / U
    mask = ~np.isnan(tau)
    np.testing.assert_allclose(tau[mask], exact[mask], atol=1e-8)


def test_light_intensity_beer_lambert():
    """LIGHTP: forward Beer-Lambert absorption along +x with I=I0 at the
    inlet: exact I = I0 exp(-beta x) to discretization error."""
    from goma_tpu.physics import LightIntensity

    I0, beta = 3.0, 1.5
    mesh = rectangle_mesh(48, 2, elem="QUAD9", xlim=(0, 1.0), ylim=(0, 0.1))
    prob = Problem(mesh, [LightIntensity(direction=(1.0, 0.0), beta=beta,
                                         interp="Q1", supg=0.2)], {})
    prob.add_dirichlet("left", "light_intp", 0, I0)
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    I = prob.get_nodal_field(res.x, "light_intp", 0)
    exact = I0 * np.exp(-beta * mesh.coords[:, 0])
    mask = ~np.isnan(I)
    np.testing.assert_allclose(I[mask], exact[mask], rtol=3e-3)


def test_multi_phase_field_advection():
    """F1..F5 (R_PHASE1..5): FillEquation with a per-phase var name —
    two independent phase fields pinned to different planes coexist."""
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.coords.shape[0], dtype=np.int32)
    prob = Problem(mesh, [
        FillEquation(interp="Q2", transient=False, supg=0.0, var="phase1"),
        FillEquation(interp="Q2", transient=False, supg=0.0, var="phase2"),
    ], {})
    prob.add_dirichlet("all", "phase1", 0, lambda c: c[:, 0] - 0.3)
    prob.add_dirichlet("all", "phase2", 0, lambda c: c[:, 1] - 0.7)
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    f1 = prob.get_nodal_field(res.x, "phase1", 0)
    f2 = prob.get_nodal_field(res.x, "phase2", 0)
    np.testing.assert_allclose(f1, mesh.coords[:, 0] - 0.3, atol=1e-12)
    np.testing.assert_allclose(f2, mesh.coords[:, 1] - 0.7, atol=1e-12)
