"""Exact-solution tests for the stress-based traction BC family:
ELEC_TRACTION (Maxwell stress), FLOW_GRADV (fully developed outflow),
FRICTION (Coulomb sliding). Reference: src/mm_ns_bc.c elec_surf_stress:4443,
flow_n_dot_T_gradv:6440; src/mm_fill_solid.c friction_n_dot_f_bc:1910."""

import numpy as np
import pytest

from goma_tpu.bc import CoulombFriction, ElecTraction, FlowGradV
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum, Potential
from goma_tpu.physics.mesh_motion import LinearElasticMesh
from goma_tpu.physics.solid import SolidTraction
from goma_tpu.fem.fields import MESH_VAR
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_elec_traction_capacitor_pressure():
    """Static dielectric fluid in a vertical uniform field E = E0 y_hat
    (parallel-plate capacitor): the Maxwell traction on the top face
    n.Te = (perm E0^2 / 2) n must be balanced by a uniform fluid pressure
    p = -perm E0^2 / 2 (u = 0 everywhere)."""
    E0, perm = 3.0, 2.0
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    eqs = [Momentum(dim=2, interp="Q2", transient=False), Continuity(interp="Q1"),
           Potential()]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    # voltage: V = -E0*y  ->  E = -grad V = E0 y_hat
    prob.add_dirichlet("bottom", "voltage", 0, 0.0)
    prob.add_dirichlet("top", "voltage", 0, -E0)
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_face_kernel("top", ElecTraction(dim=2, permittivity=perm))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    v = prob.get_nodal_field(res.x, "velocity", 1)
    p = prob.get_nodal_field(res.x, "pressure", 0)
    assert np.nanmax(np.abs(u)) < 1e-9 and np.nanmax(np.abs(v)) < 1e-9
    p_exact = -0.5 * perm * E0**2
    np.testing.assert_allclose(p[~np.isnan(p)], p_exact, atol=1e-8)


def test_flow_gradv_poiseuille_outflow():
    """Plane Poiseuille flow: parabolic inflow, no-slip walls, FLOW_GRADV
    open outflow with p_datum=0. The fully-developed profile passes through
    unchanged and the pressure gradient matches dp/dx = -2 mu umax / h^2."""
    mu, umax = 0.7, 1.0
    L, H = 3.0, 1.0
    mesh = rectangle_mesh(18, 6, elem="QUAD9", xlim=(0, L), ylim=(0, H))
    eqs = [Momentum(dim=2, interp="Q2", transient=False), Continuity(interp="Q1")]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": mu})

    def u_in(q, X0, params):
        return None  # placeholder (not used)

    # parabolic inflow u = 4 umax y(H-y)/H^2
    prob.add_dirichlet("left", "velocity", 0,
                       lambda c: 4 * umax * c[:, 1] * (H - c[:, 1]) / H**2)
    prob.add_dirichlet("left", "velocity", 1, 0.0)
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_face_kernel("right", FlowGradV(dim=2, p_datum=0.0))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    c = mesh.coords
    u = prob.get_nodal_field(res.x, "velocity", 0)
    p = prob.get_nodal_field(res.x, "pressure", 0)
    # outlet profile still parabolic
    out = np.isclose(c[:, 0], L) & ~np.isnan(u)
    u_ex = 4 * umax * c[out, 1] * (H - c[out, 1]) / H**2
    np.testing.assert_allclose(u[out], u_ex, atol=2e-3 * umax)
    # pressure linear in x with the exact Poiseuille gradient; p ~ 0 at exit
    dpdx_ex = -8.0 * mu * umax / H**2
    pin = ~np.isnan(p)
    p_fit = np.polyfit(c[pin, 0], p[pin], 1)
    np.testing.assert_allclose(p_fit[0], dpdx_ex, rtol=2e-2)
    assert abs(p_fit[0] * L + p_fit[1] - 0.0) < 2e-2 * abs(dpdx_ex * L)


def test_coulomb_friction_block_shear():
    """Elastic block compressed from the top (sigma_yy = -N) while sliding
    in +x on its base: friction drags the base with traction -mu_f N x_hat
    (opposing the slide), so steady sliding needs the driving shear
    +mu_f N x_hat on the top face. Exact uniform state: sigma_yy=-N,
    sigma_xy=+mu_f*N; check the displacement field against it."""
    N, mu_f = 0.1, 0.3
    G, lam = 10.0, 5.0
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [LinearElasticMesh(dim=2)],
                   {"mesh_shear_modulus": G, "mesh_lambda": lam})
    # base: no normal motion; friction supplies the tangential condition
    prob.add_dirichlet("bottom", MESH_VAR, 1, 0.0)
    # pin rigid x-translation at one base point (friction row is traction-
    # level, leaves translation null space along x otherwise)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", MESH_VAR, 0, 0.0)
    # top: normal load -N plus the driving shear +mu_f N; sides carry the
    # uniform-state shear (sigma.n = (0, -/+ mu_f N)) so the exact solution
    # is the homogeneous stress state on the finite block
    prob.add_face_kernel("top", SolidTraction(
        dim=2, traction=(mu_f * N, -N), var=MESH_VAR))
    prob.add_face_kernel("left", SolidTraction(
        dim=2, traction=(0.0, -mu_f * N), var=MESH_VAR))
    prob.add_face_kernel("right", SolidTraction(
        dim=2, traction=(0.0, mu_f * N), var=MESH_VAR))
    prob.add_face_kernel("bottom", CoulombFriction(
        dim=2, mu_f=mu_f, var=MESH_VAR, slide_velocity=(1.0, 0.0)))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, MESH_VAR, 0)
    dy = prob.get_nodal_field(res.x, MESH_VAR, 1)
    c = mesh.coords
    # exact uniform-stress solution (plane strain, small strain):
    # eps from  sigma = 2G eps + lam tr(eps) I  with
    # sigma = [[0, mu_f N], [mu_f N, -N]]
    # -> eps_xy = mu_f N/(2G); eps_xx,eps_yy solve the 2x2 normal system
    A = np.array([[2 * G + lam, lam], [lam, 2 * G + lam]])
    exx, eyy = np.linalg.solve(A, [0.0, -N])
    exy = mu_f * N / (2 * G)
    # displacement: u = exx x + g1(y), v = eyy y + g2(x); with v(y=0)=0 and
    # u(0,0)=0 the shear splits as u += 2exy*y (base slides freely in x,
    # so all shear strain goes into u)
    u_ex = exx * c[:, 0] + 2 * exy * c[:, 1]
    v_ex = eyy * c[:, 1]
    np.testing.assert_allclose(dx, u_ex, atol=1e-4)
    np.testing.assert_allclose(dy, v_ex, atol=1e-4)


def test_coulomb_friction_acoustic_reduction():
    """FRICTION_ACOUSTIC: with acoustic surface velocity v_ac > |v_slide|,
    the effective friction coefficient drops by (2/pi) asin(|v|/v_ac).
    Same block as above with the top shear scaled by that factor."""
    N, mu_f = 0.1, 0.3
    G, lam = 10.0, 5.0
    v_slide, v_ac = 1.0, 2.0
    fac = (2.0 / np.pi) * np.arcsin(v_slide / v_ac)
    mu_eff = mu_f * fac
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [LinearElasticMesh(dim=2)],
                   {"mesh_shear_modulus": G, "mesh_lambda": lam})
    prob.add_dirichlet("bottom", MESH_VAR, 1, 0.0)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", MESH_VAR, 0, 0.0)
    prob.add_face_kernel("top", SolidTraction(
        dim=2, traction=(mu_eff * N, -N), var=MESH_VAR))
    prob.add_face_kernel("left", SolidTraction(
        dim=2, traction=(0.0, -mu_eff * N), var=MESH_VAR))
    prob.add_face_kernel("right", SolidTraction(
        dim=2, traction=(0.0, mu_eff * N), var=MESH_VAR))
    prob.add_face_kernel("bottom", CoulombFriction(
        dim=2, mu_f=mu_f, var=MESH_VAR, slide_velocity=(v_slide, 0.0),
        acoustic_velocity=v_ac))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, MESH_VAR, 0)
    c = mesh.coords
    A = np.array([[2 * G + lam, lam], [lam, 2 * G + lam]])
    exx, _ = np.linalg.solve(A, [0.0, -N])
    exy = mu_eff * N / (2 * G)
    u_ex = exx * c[:, 0] + 2 * exy * c[:, 1]
    np.testing.assert_allclose(dx, u_ex, atol=1e-4)


def test_slope_bc_tilts_boundary():
    """SLOPE: n.s = 0 drives the deformed top boundary parallel to the
    prescribed slope vector s = (1, eps): the boundary becomes a ramp of
    slope eps (small-strain elastic mesh, left edge pinned)."""
    from goma_tpu.bc import SlopeBC

    eps_s = 0.05
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [LinearElasticMesh(dim=2)],
                   {"mesh_shear_modulus": 5.0, "mesh_lambda": 2.0})
    for ns in ("bottom", "left", "right"):
        prob.add_dirichlet(ns, MESH_VAR, 0, 0.0)
    prob.add_dirichlet("bottom", MESH_VAR, 1, 0.0)
    # pin the top-left corner height so the ramp is anchored
    tl = np.where(np.isclose(mesh.coords[:, 0], 0.0)
                  & np.isclose(mesh.coords[:, 1], 1.0))[0]
    mesh.nodesets["tl"] = tl.astype(np.int32)
    prob.add_dirichlet("tl", MESH_VAR, 1, 0.0)
    prob.add_face_kernel("top", SlopeBC(dim=2, slope=(1.0, eps_s),
                                        penalty=1e6))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=10, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dy = prob.get_nodal_field(res.x, MESH_VAR, 1)
    c = mesh.coords
    top = np.isclose(c[:, 1], 1.0)
    # n = (-h', 1)/|..|; n.s = 0 -> h' = eps_s: fitted ramp slope within a
    # few % (elastic side constraints bow the sheet slightly)
    fit = np.polyfit(c[top, 0], dy[top], 1)[0]
    np.testing.assert_allclose(fit, eps_s, rtol=5e-2)


def test_force_sic_matches_weak_traction():
    """FORCE_SIC: pinning the pointwise traction (n.TT.n, t.TT.n) =
    (-N, tau) reproduces the same uniform stress state as the weak
    SolidTraction loading."""
    from goma_tpu.bc import ForceSIC

    N, tau = 0.1, 0.03
    G, lam = 10.0, 5.0
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [LinearElasticMesh(dim=2)],
                   {"mesh_shear_modulus": G, "mesh_lambda": lam})
    prob.add_dirichlet("bottom", MESH_VAR, 0, 0.0)
    prob.add_dirichlet("bottom", MESH_VAR, 1, 0.0)
    # top: strong force balance; sides: consistent weak tractions
    prob.add_face_kernel("top", ForceSIC(dim=2, force=(-N, -tau),
                                         penalty=1e5))
    prob.add_face_kernel("left", SolidTraction(
        dim=2, traction=(0.0, -tau), var=MESH_VAR))
    prob.add_face_kernel("right", SolidTraction(
        dim=2, traction=(0.0, tau), var=MESH_VAR))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=10, tol_residual=1e-9,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, MESH_VAR, 0)
    dy = prob.get_nodal_field(res.x, MESH_VAR, 1)
    c = mesh.coords
    # exact uniform state sigma = [[0, tau], [tau, -N]] with u(y=0)=0:
    A = np.array([[2 * G + lam, lam], [lam, 2 * G + lam]])
    exx, eyy = np.linalg.solve(A, [0.0, -N])
    exy = tau / (2 * G)
    u_ex = exx * c[:, 0] + 2 * exy * c[:, 1] - exx * c[:, 0] * 0
    # u(x,0)=0 forces exx*x term to vanish at base: subtract it so both
    # constraints hold only if exx ~ 0... instead compare strains via fit
    # shear and vertical strain from the displacement field:
    np.testing.assert_allclose(
        np.polyfit(c[np.isclose(c[:, 0], 0.5), 1],
                   dy[np.isclose(c[:, 0], 0.5)], 1)[0], eyy, rtol=5e-2)
    np.testing.assert_allclose(
        np.polyfit(c[np.isclose(c[:, 0], 0.5), 1],
                   dx[np.isclose(c[:, 0], 0.5)], 1)[0], 2 * exy, rtol=5e-2)


def test_air_film_slip_navier_equivalence():
    """AIR_FILM (gas_flow=0) is exactly NavierSlip with beta = 1/gas_mu and
    full-vector damping; the ROT variant's substrate velocity is the rigid
    rotation field."""
    from goma_tpu.bc import AirFilmSlip, NavierSlip
    import jax.numpy as jnp

    gas_mu, U = 3.0, 0.4
    mesh = rectangle_mesh(5, 3, elem="QUAD9")
    eqs = [Momentum(dim=2, interp="Q2", transient=False),
           Continuity(interp="Q1")]

    def solve(kern):
        mesh2 = rectangle_mesh(5, 3, elem="QUAD9")
        mesh2.nodesets["pin"] = np.array([0], dtype=np.int32)
        p = Problem(mesh2, eqs, {"rho": 1.0, "mu": 1.0})
        p.add_dirichlet("top", "velocity", 0, U)
        p.add_dirichlet("top", "velocity", 1, 0.0)
        p.add_dirichlet("left", "velocity", 0, 0.0)
        p.add_dirichlet("left", "velocity", 1, 0.0)
        p.add_dirichlet("right", "velocity", 0, 0.0)
        p.add_dirichlet("right", "velocity", 1, 0.0)
        p.add_dirichlet("pin", "pressure", 0, 0.0)
        p.add_face_kernel("bottom", kern)
        p.finalize()
        r = NewtonSolver(p, NewtonOptions(max_iter=8, tol_residual=1e-10,
                                          linear_solver="direct")).solve(
            np.zeros(p.dofmap.n_dof), p.base_params())
        assert r.converged
        return p, np.asarray(r.x)

    p1, x1 = solve(AirFilmSlip(dim=2, gas_mu=gas_mu, v_s=(0.2, 0.0)))
    p2, x2 = solve(NavierSlip(dim=2, beta=1.0 / gas_mu, u_wall=(0.2, 0.0),
                              tangential_only=False))
    np.testing.assert_allclose(x1, x2, atol=1e-10)

    # rotation field: substrate velocity at (x, y) is
    # (omega (y-y0), -omega (x-x0)); check via the residual difference of
    # the two equivalent constructions at a point state
    om, x0c, y0c = 2.0, 0.5, -1.0
    k_rot = AirFilmSlip(dim=2, gas_mu=gas_mu, rotation=(om, x0c, y0c))
    class S: pass
    s = S()
    s.x = jnp.array([[0.3, 0.0]])
    s.val = {"velocity": jnp.array([[0.1, -0.2]])}
    s.phi = {"velocity": jnp.array([[1.0]])}
    out = np.asarray(k_rot.residual(s, {}, {}))[0, :, 0]
    vs = np.array([om * (0.0 - y0c), -om * (0.3 - x0c)])
    np.testing.assert_allclose(out, gas_mu * (np.array([0.1, -0.2]) - vs),
                               rtol=1e-12)


def test_surface_viscosity_stretch_moment():
    """CAPILLARY_SHEAR_VISC (Boussinesq-Scriven): planar extension
    u=(ax,-ay) over a flat face gives surface stress
    tau_ss = (kappa_s + mu_s) a; the x-moment of the added rows equals
    tau_ss * L exactly, and pure cross-shear u=(gy,0) adds nothing."""
    from goma_tpu.bc.free_surface import SurfaceViscosity
    from goma_tpu.fem.equations import PassiveVar
    import jax.numpy as jnp

    a, mu_s, k_s = 0.7, 1.3, 0.4
    mesh = rectangle_mesh(6, 3, elem="QUAD9")
    # keep the bottom rows free of Dirichlet (they carry the kernel terms)
    nb = np.where(mesh.coords[:, 1] > 1e-9)[0].astype(np.int32)
    mesh.nodesets["notbot"] = nb
    eqs = [PassiveVar("velocity", 2, "Q2", reg=1e-12)]

    def delta_R(ufun):
        p1 = Problem(mesh, eqs, {})
        p1.add_dirichlet("notbot", "velocity", 0, lambda c: ufun(c)[0])
        p1.add_dirichlet("notbot", "velocity", 1, lambda c: ufun(c)[1])
        p1.add_face_kernel("bottom", SurfaceViscosity(
            dim=2, mu_s=mu_s, kappa_s=k_s))
        p1.finalize()
        p0 = Problem(mesh, eqs, {})
        p0.add_dirichlet("notbot", "velocity", 0, lambda c: ufun(c)[0])
        p0.add_dirichlet("notbot", "velocity", 1, lambda c: ufun(c)[1])
        p0.finalize()
        x0 = np.zeros(p1.dofmap.n_dof)
        x0 = p1.set_nodal_field(x0, "velocity", 0, ufun(mesh.coords)[0])
        x0 = p1.set_nodal_field(x0, "velocity", 1, ufun(mesh.coords)[1])
        return (np.asarray(p1.residual(jnp.asarray(x0), p1.base_params()))
                - np.asarray(p0.residual(jnp.asarray(x0),
                                         p0.base_params()))), p1

    dR, p1 = delta_R(lambda c: (a * c[:, 0], -a * c[:, 1]))
    dm = p1.dofmap
    dx = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
    ok = dx >= 0
    mom = (mesh.coords[ok, 0] * dR[dx[ok]]).sum()
    np.testing.assert_allclose(mom, (k_s + mu_s) * a, rtol=1e-10)
    # cross shear: no surface strain -> zero contribution
    dR2, _ = delta_R(lambda c: (0.3 * c[:, 1], 0.0 * c[:, 0]))
    assert np.abs(dR2).max() < 1e-12
