"""Post-processing tests: Poiseuille fluxes/forces with analytic values,
volume integrals, cavity stream function vs Ghia."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.post import (
    flow_rate,
    heat_flux,
    sideset_integral,
    stream_function,
    traction_integrand,
    volume_integral,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def poiseuille(n=6, mu=0.7, G=2.0, H=1.0, L=2.0):
    """Pressure-driven channel flow: u(y) = G/(2 mu) y (H - y)."""
    mesh = rectangle_mesh(2 * n, n, elem="QUAD9", xlim=(0, L), ylim=(0, H))
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 0.0, "mu": mu})
    uprof = lambda c: G / (2 * mu) * c[:, 1] * (H - c[:, 1])
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uprof)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=6, tol_residual=1e-10, linear_tol=1e-12,
                            linear_maxiter=3000, gmres_restart=100)
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    return mesh, prob, res, dict(mu=mu, G=G, H=H, L=L)


def test_flow_rate_and_wall_shear():
    mesh, prob, res, c = poiseuille()
    params = prob.base_params()
    # flow rate through the outlet: Q = G H^3 / (12 mu)
    Qfn = sideset_integral(prob, "right", flow_rate)
    Q = float(Qfn(res.x, params))
    np.testing.assert_allclose(Q, c["G"] * c["H"] ** 3 / (12 * c["mu"]), rtol=1e-8)
    # wall shear: force ON the fluid from the bottom wall = -G H L / 2 (drag)
    Ffn = sideset_integral(prob, "bottom", traction_integrand())
    F = np.asarray(Ffn(res.x, params))
    np.testing.assert_allclose(F[0], -c["G"] * c["H"] * c["L"] / 2, rtol=1e-6)
    # inflow + outflow flow rates cancel
    Qin = float(sideset_integral(prob, "left", flow_rate)(res.x, params))
    np.testing.assert_allclose(Qin + Q, 0.0, atol=1e-10)


def test_volume_integral_dissipation():
    mesh, prob, res, c = poiseuille()
    params = prob.base_params()
    # kinetic dissipation: int 2 mu D:D = Q * G * L (pump power)
    def dissipation(fv, mat, params):
        gu = fv.grad["velocity"]
        D = 0.5 * (gu + jnp.swapaxes(gu, 1, 2))
        return 2 * c["mu"] * jnp.sum(D * D, axis=(1, 2))

    W = float(volume_integral(prob, dissipation)(res.x, params))
    Q = c["G"] * c["H"] ** 3 / (12 * c["mu"])
    np.testing.assert_allclose(W, Q * c["G"] * c["L"], rtol=1e-8)
    # domain volume
    vol = float(volume_integral(prob, lambda fv, m, p: jnp.ones_like(fv.detJ))(res.x, params))
    np.testing.assert_allclose(vol, c["H"] * c["L"], rtol=1e-12)


def test_cavity_stream_function():
    from tests.test_cavity import cavity_problem

    mesh, prob = cavity_problem(n=16, Re=100.0)
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-9, linear_tol=1e-10,
                            gmres_restart=100, linear_maxiter=4000)
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    psi = stream_function(prob, res.x)
    # Ghia et al. Re=100: psi_min ~ -0.1034 at vortex center
    assert abs(np.nanmin(psi) - (-0.1034)) < 0.006, np.nanmin(psi)


def test_conduction_heat_flux_balance():
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"k": 2.5})
    prob.add_dirichlet("left", "temperature", 0, 1.0)
    prob.add_dirichlet("right", "temperature", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, linear_tol=1e-12)).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    params = prob.base_params()
    qin = float(sideset_integral(prob, "left", heat_flux)(res.x, params))
    qout = float(sideset_integral(prob, "right", heat_flux)(res.x, params))
    np.testing.assert_allclose(qin, -2.5, rtol=1e-8)  # influx
    np.testing.assert_allclose(qout, 2.5, rtol=1e-8)
