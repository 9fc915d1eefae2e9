"""Population balance (Wheeler/QMOM), acoustic Helmholtz, projections,
segregated solver tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    AcousticHelmholtz,
    Continuity,
    Energy,
    MomentEquations,
    Momentum,
    ProjectionEquation,
    SommerfeldBC,
    wheeler_n2,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.solvers.segregated import SegregatedSolver, SubProblem


def test_wheeler_recovers_two_peaks():
    w = np.array([0.3, 0.7])
    L = np.array([1.0, 2.5])
    m = np.array([np.sum(w * L**k) for k in range(4)])
    wj, Lj = wheeler_n2(jnp.asarray(m))
    order = np.argsort(np.asarray(Lj))
    np.testing.assert_allclose(np.asarray(Lj)[order], L, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wj)[order], w, rtol=1e-12)


def test_moments_growth_ode():
    """Uniform moments with constant growth G: dMk/dt = k G M_{k-1}.
    QMOM closure is exact for constant growth; compare against the analytic
    cascade integrated by scipy."""
    from scipy.integrate import solve_ivp
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    G = 0.4
    mesh = rectangle_mesh(3, 3, elem="QUAD4")
    prob = Problem(
        mesh,
        [MomentEquations(growth=lambda L: G * jnp.ones_like(L), interp="Q1",
                         transient=True, supg=0.0)],
        {},
    )
    prob.finalize()
    m0 = np.array([1.0, 1.2, 1.6, 2.4])
    x0 = np.zeros(prob.dofmap.n_dof)
    for k in range(4):
        x0 = prob.set_nodal_field(x0, "moments", k, m0[k])
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-11, linear_solver="direct"),
        TimeOptions(dt0=0.02, t_end=0.5, adapt=False, theta=0.5),
    )
    res = ts.run(x0, prob.base_params())

    def rhs(t, m):
        return [0.0] + [k * G * m[k - 1] for k in range(1, 4)]

    ref = solve_ivp(rhs, (0, 0.5), m0, rtol=1e-10, atol=1e-12).y[:, -1]
    got = np.array([np.nanmean(prob.get_nodal_field(res.x, "moments", k)) for k in range(4)])
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_acoustic_plane_wave():
    """1D Helmholtz with hard-driven left end and absorbing right end:
    p = exp(-i k x) traveling wave, |p| = 1 everywhere."""
    k = 2 * np.pi
    mesh = rectangle_mesh(40, 1, elem="QUAD9", xlim=(0, 2.0), ylim=(0, 0.05))
    prob = Problem(
        mesh,
        [AcousticHelmholtz("real", k, interp="Q2"),
         AcousticHelmholtz("imag", k, interp="Q2")],
        {},
    )
    prob.add_dirichlet("left", "acoustic_preal", 0, 1.0)
    prob.add_dirichlet("left", "acoustic_pimag", 0, 0.0)
    prob.add_face_kernel("right", SommerfeldBC("real", k))
    prob.add_face_kernel("right", SommerfeldBC("imag", k))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    pr = prob.get_nodal_field(res.x, "acoustic_preal")
    pi = prob.get_nodal_field(res.x, "acoustic_pimag")
    x = mesh.coords[:, 0]
    np.testing.assert_allclose(pr, np.cos(k * x), atol=2e-2)
    np.testing.assert_allclose(pi, -np.sin(k * x), atol=2e-2)
    np.testing.assert_allclose(np.sqrt(pr**2 + pi**2), 1.0, atol=2e-2)


def test_projection_shear_rate():
    from goma_tpu.physics.materials import shear_rate

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    eqs = [
        Momentum(dim=2, transient=False), Continuity(),
        ProjectionEquation("shear_rate", 1,
                           lambda fv, m, p: shear_rate(fv)[:, None], interp="Q1"),
    ]
    prob = Problem(mesh, eqs, {"rho": 0.0, "mu": 1.0})
    shear = lambda c: 2.0 * c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, shear)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    gd = prob.get_nodal_field(res.x, "shear_rate")
    np.testing.assert_allclose(gd[~np.isnan(gd)], 2.0, atol=1e-8)


def test_segregated_natural_convection():
    """Boussinesq convection solved segregated (flow <-> temperature Picard)
    matches the monolithic solve."""
    from goma_tpu.physics.materials import BoussinesqBodyForce

    Ra_f = 1e3
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)

    def flow_bcs(prob):
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, "velocity", 0, 0.0)
            prob.add_dirichlet(ns, "velocity", 1, 0.0)
        prob.add_dirichlet("pin", "pressure", 0, 0.0)

    def temp_bcs(prob):
        prob.add_dirichlet("left", "temperature", 0, 1.0)
        prob.add_dirichlet("right", "temperature", 0, 0.0)

    # monolithic
    mono = Problem(
        mesh,
        [Momentum(dim=2, transient=False), Continuity(),
         Energy(interp="Q2", transient=False)],
        {"rho": 1.0, "mu": 1.0, "k": 1.0, "Cp": 1.0,
         "body_force": BoussinesqBodyForce([0.0, Ra_f], beta=1.0, T0=0.0)},
    )
    flow_bcs(mono)
    temp_bcs(mono)
    mono.finalize()
    rm = NewtonSolver(mono, NewtonOptions(max_iter=12, tol_residual=1e-10,
                                          linear_solver="direct")).solve(
        np.zeros(mono.dofmap.n_dof), mono.base_params()
    )
    assert rm.converged

    # segregated: flow problem sees T as external field; temperature problem
    # sees (ux, uy) as external advection
    class ExtBoussinesq:
        def __call__(self, fv, mat, params):
            T = fv.ext["T"]
            # must match BoussinesqBodyForce: g*(1 - beta*(T - T0))
            return jnp.stack([jnp.zeros_like(T), Ra_f * (1.0 - T)], axis=1)

    flow = Problem(
        mesh, [Momentum(dim=2, transient=False), Continuity()],
        {"rho": 1.0, "mu": 1.0, "body_force": ExtBoussinesq()},
        external_fields=("T",),
    )
    flow_bcs(flow)
    flow.finalize()

    class AdvectedEnergy(Energy):
        def residual(self, fv, mat, params):
            gT = fv.grad["temperature"][:, 0, :]
            u = jnp.stack([fv.ext["ux"], fv.ext["uy"]], axis=1)
            adv = jnp.einsum("qk,qk->q", u, gT)
            phi = fv.phi["temperature"]
            gphi = fv.gphi["temperature"]
            c = jnp.einsum("q,qi->qi", adv, phi) + jnp.einsum("qk,qik->qi", gT, gphi)
            return c[:, None, :]

    temp = Problem(mesh, [AdvectedEnergy(interp="Q2", transient=False)], {},
                   external_fields=("ux", "uy"))
    temp_bcs(temp)
    temp.finalize()

    subs = [
        SubProblem("temp", temp,
                   lambda x: {"T": np.nan_to_num(temp.get_nodal_field(x, "temperature"))}),
        SubProblem("flow", flow,
                   lambda x: {"ux": np.nan_to_num(flow.get_nodal_field(x, "velocity", 0)),
                              "uy": np.nan_to_num(flow.get_nodal_field(x, "velocity", 1))}),
    ]
    seg = SegregatedSolver(
        subs, max_outer=40, tol=1e-9,
    )
    # newton opts
    for s in subs:
        seg._solvers[s.name].opts.linear_solver = "direct"
        seg._solvers[s.name].opts.tol_residual = 1e-11
    res = seg.solve({"temp": np.zeros(temp.dofmap.n_dof),
                     "flow": np.zeros(flow.dofmap.n_dof)})
    assert res.converged, res.history[-3:]

    T_seg = temp.get_nodal_field(res.x["temp"], "temperature")
    T_mono = mono.get_nodal_field(rm.x, "temperature")
    np.testing.assert_allclose(T_seg, T_mono, atol=1e-6)
    u_seg = flow.get_nodal_field(res.x["flow"], "velocity", 0)
    u_mono = mono.get_nodal_field(rm.x, "velocity", 0)
    np.testing.assert_allclose(u_seg, u_mono, atol=1e-5)


def test_viscosity_property_models():
    """Property-model library vs hand math at a synthetic state (reference
    src/mm_viscosity.c models: POWER_LAW, CARREAU, BINGHAM, CARREAU_WLF,
    SUSPENSION, FILL density)."""
    import jax.numpy as jnp
    from goma_tpu.physics.materials import (
        ArrheniusViscosity,
        BinghamViscosity,
        CarreauViscosity,
        CarreauWLFViscosity,
        FillerDensity,
        PowerLawViscosity,
        SuspensionViscosity,
        shear_rate,
    )

    class FV:  # synthetic quad-point state: simple shear du/dy = 2, T, C
        grad = {"velocity": jnp.array([[[0.0, 2.0], [0.0, 0.0]]])}
        val = {"temperature": jnp.array([[400.0]]),
               "species": jnp.array([[0.2]])}

    fv = FV()
    gd = float(shear_rate(fv)[0])
    np.testing.assert_allclose(gd, 2.0, rtol=1e-12)

    np.testing.assert_allclose(
        float(PowerLawViscosity(m=3.0, n=0.5)(fv, {}, {})[0]),
        3.0 * 2.0 ** (-0.5), rtol=1e-12)
    np.testing.assert_allclose(
        float(CarreauViscosity(mu0=10.0, mu_inf=1.0, lam=0.5, n=0.3)(fv, {}, {})[0]),
        1.0 + 9.0 * (1 + 1.0) ** ((0.3 - 1) / 2), rtol=1e-12)
    np.testing.assert_allclose(
        float(BinghamViscosity(mu0=1.0, tau_y=4.0, F=2.0)(fv, {}, {})[0]),
        1.0 + 4.0 * (1 - np.exp(-4.0)) / 2.0, rtol=1e-9)
    aT = np.exp(10.0 * (350.0 - 400.0) / (50.0 + 400.0 - 350.0))
    np.testing.assert_allclose(
        float(CarreauWLFViscosity(mu0=10.0, mu_inf=1.0, lam=0.5, n=0.3,
                                  c1=10.0, c2=50.0, T_ref=350.0)(fv, {}, {})[0]),
        aT * (1.0 + 9.0 * (1 + (aT * 1.0) ** 2) ** ((0.3 - 1) / 2)), rtol=1e-9)
    np.testing.assert_allclose(
        float(ArrheniusViscosity(mu0=2.0, E=1000.0, T_ref=350.0)(fv, {}, {})[0]),
        2.0 * np.exp(1000.0 * (1 / 400.0 - 1 / 350.0)), rtol=1e-12)
    np.testing.assert_allclose(
        float(SuspensionViscosity(mu0=1.0, Cmax=0.68)(fv, {}, {})[0]),
        (1 - 0.2 / 0.68) ** (-1.82), rtol=1e-9)
    np.testing.assert_allclose(
        float(FillerDensity(rho_f=1.0, rho_s=2.5)(fv, {}, {})[0]),
        2.5 * 0.2 + 1.0 * 0.8, rtol=1e-12)


def test_power_law_poiseuille():
    """Power-law channel flow vs the analytic profile
    u(y) = n/(n+1) (G/m)^(1/n) [(H/2)^((n+1)/n) - |y-H/2|^((n+1)/n)]."""
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.physics.materials import PowerLawViscosity
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    m_c, n_c, G, H = 1.0, 0.6, 2.0, 1.0
    mesh = rectangle_mesh(4, 24, elem="QUAD9", xlim=(0, 0.25), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)

    def uex(c):
        r = (n_c / (n_c + 1.0)) * (G / m_c) ** (1.0 / n_c)
        return r * ((H / 2) ** ((n_c + 1) / n_c)
                    - np.abs(c[:, 1] - H / 2) ** ((n_c + 1) / n_c))

    prob = Problem(
        mesh,
        [Momentum(dim=2, transient=False, convection=False), Continuity()],
        {"rho": 1.0, "mu": PowerLawViscosity(m=m_c, n=n_c),
         "body_force": np.array([G, 0.0])},
    )
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uex)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "velocity", 0, uex)
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=20, tol_residual=1e-9, linear_solver="direct")
    ).solve(x0, prob.base_params())
    assert res.converged, res.summary()
    u = prob.get_nodal_field(res.x, "velocity", 0)
    ok = ~np.isnan(u)
    err = np.max(np.abs(u[ok] - uex(mesh.coords[ok]))) / np.max(uex(mesh.coords[ok]))
    assert err < 0.01, err


def test_lognormal_moment_closure():
    """Log-normal closure + Wright correction (mm_fill_population.c
    moments_set_lognormal:55 / moment_correction_wright:78): moments of an
    exact log-normal are reproduced to machine precision, and a perturbed
    (unrealizable) set is corrected onto a realizable one."""
    import jax.numpy as jnp
    from goma_tpu.physics.population import (lognormal_moments,
                                             moment_correction_wright,
                                             wheeler_n2)

    mu, s2, m0 = 0.3, 0.4, 2.0
    ks = np.arange(4.0)
    M = m0 * np.exp(ks * mu + 0.5 * ks**2 * s2)
    np.testing.assert_allclose(np.asarray(lognormal_moments(jnp.asarray(M))),
                               M, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(moment_correction_wright(jnp.asarray(M))), M, rtol=1e-12)

    # corrupt m2 so the Hankel condition fails; the corrected set must be
    # realizable (Wheeler inversion yields positive weights and nodes)
    Mbad = M.copy()
    Mbad[2] = 0.3 * M[1] ** 2 / M[0]  # violates m2 m0 >= m1^2
    Mc = np.asarray(moment_correction_wright(jnp.asarray(Mbad)))
    w, L = wheeler_n2(jnp.asarray(Mc))
    assert np.all(np.asarray(w) >= 0) and np.all(np.isfinite(np.asarray(L)))
