"""Named BC catalog (mm_ns_bc.c / bc_integ.c / bc_special.c parity):
Navier slip, imposed-pressure open boundaries, convective heat flux, and
additive point loads — each validated against an exact solution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.bc import ConvectiveHeatFlux, FlowPressure, NavierSlip
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver

OPTS = NewtonOptions(max_iter=10, tol_residual=1e-11, linear_solver="direct")


def test_navier_slip_couette():
    """Couette with Navier slip at the bottom wall: exact linear profile
    u(y) = U (y + Ls)/(H + Ls), slip length Ls = mu * beta."""
    H, U, mu, beta = 1.0, 1.0, 0.5, 2.0
    Ls = mu * beta
    mesh = rectangle_mesh(4, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": mu})
    prob.add_dirichlet("top", "velocity", 0, U)
    for ns in ("top", "bottom", "left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel("bottom", NavierSlip(dim=2, beta=beta))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    exact = U * (mesh.coords[:, 1] + Ls) / (H + Ls)
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-8)


def test_flow_hydrostatic_equilibrium():
    """Closed box under gravity, FLOW_HYDROSTATIC at the top: exact rest
    state u = 0, p = P0 + rho g.(x - x0)."""
    rho, gy, P0 = 2.0, -3.0, 5.0
    mesh = rectangle_mesh(5, 5, elem="QUAD9")

    def body(fv, mat, params):
        # acceleration: the kernel multiplies by rho
        return jnp.broadcast_to(jnp.asarray([0.0, gy]), fv.x.shape)

    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": rho, "mu": 1.0, "body_force": body})
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    # open top with the hydrostatic pressure imposed there
    prob.add_face_kernel("top", FlowPressure(dim=2, p0=P0, rho=rho,
                                             g=(0.0, gy), x0=(0.0, 1.0)))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    v = prob.get_nodal_field(res.x, "velocity", 1)
    p = prob.get_nodal_field(res.x, "pressure", 0)
    assert np.nanmax(np.abs(u)) < 1e-8 and np.nanmax(np.abs(v)) < 1e-8
    exact_p = P0 + rho * gy * (mesh.coords[:, 1] - 1.0)
    mask = ~np.isnan(p)
    np.testing.assert_allclose(p[mask], exact_p[mask], atol=1e-7)


def test_flow_pressure_poiseuille():
    """Pressure-driven channel: FLOW_PRESSURE dP at inlet, 0 at outlet;
    flow rate within a few % of dP H^3 / (12 mu L) (do-nothing corners make
    it inexact)."""
    L, H, mu, dP = 2.0, 1.0, 1.0, 12.0
    mesh = rectangle_mesh(12, 6, elem="QUAD9", xlim=(0, L), ylim=(0, H))
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 0.0, "mu": mu})
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)  # straight in/outflow
    prob.add_face_kernel("left", FlowPressure(dim=2, p0=dP))
    prob.add_face_kernel("right", FlowPressure(dim=2, p0=0.0))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    from goma_tpu.post import sideset_integral

    flow = sideset_integral(prob, "right",
                            lambda sfv, mat, params: jnp.einsum(
                                "qk,qk->q", sfv.val["velocity"], sfv.normal))
    Q = float(flow(res.x, prob.base_params()))
    Q_exact = dP * H**3 / (12 * mu * L)
    assert abs(Q - Q_exact) / Q_exact < 0.03, (Q, Q_exact)


def test_convective_heat_flux():
    """1D conduction with QCONV at the right: T = T0 + c x,
    c = -h (T0 - Tinf) / (k + h L)."""
    k, h, T0, Tinf, L = 2.0, 3.0, 1.0, 0.2, 1.0
    mesh = rectangle_mesh(8, 3, elem="QUAD9", xlim=(0, L), ylim=(0, 0.4))
    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"k": k})
    prob.add_dirichlet("left", "temperature", 0, T0)
    prob.add_face_kernel("right", ConvectiveHeatFlux(h=h, T_inf=Tinf))
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    c = -h * (T0 - Tinf) / (k + h * L)
    np.testing.assert_allclose(T, T0 + c * mesh.coords[:, 0], atol=1e-9)


def test_point_loads_linear_and_nonlinear():
    """Point loads (bc_special parity). Q1 conduction strip: trapezoid-rule
    point loads on the right edge ARE the consistent P1 load vector for a
    uniform influx q -> exact linear T = q x / k. Then a nonlinear
    (radiative T^4) point sink: quadratic Newton convergence checks the AD
    row Jacobian wiring."""
    k, qn, L, H = 1.5, 2.0, 1.0, 0.5
    nx, ny = 5, 3
    mesh = rectangle_mesh(nx, ny, elem="QUAD4", xlim=(0, L), ylim=(0, H))
    prob = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)],
                   {"k": k})
    prob.add_dirichlet("left", "temperature", 0, 0.0)
    hy = H / ny
    right = mesh.nodesets["right"]
    y = mesh.coords[right, 1]
    interior = (y > 1e-12) & (y < H - 1e-12)
    w = np.where(interior, hy, hy / 2)  # trapezoid weights per node
    wmap = {int(n): float(wi) for n, wi in zip(right, w)}

    def load(q, X0, params):
        # influx qn: residual convention is +outflux, so subtract
        yv = X0[1]
        wi = jnp.where((yv > 1e-12) & (yv < H - 1e-12), hy, hy / 2)
        return -jnp.asarray([qn]) * wi

    prob.add_point_load("right", "temperature", load)
    prob.finalize()
    res = NewtonSolver(prob, OPTS).solve(np.zeros(prob.dofmap.n_dof),
                                         prob.base_params())
    assert res.converged and res.iters <= 2
    T = prob.get_nodal_field(res.x, "temperature", 0)
    np.testing.assert_allclose(T, qn * mesh.coords[:, 0] / k, atol=1e-10)

    # nonlinear point sink at the top-right corner node: f = c T^4
    prob2 = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)],
                    {"k": k})
    prob2.add_dirichlet("left", "temperature", 0, 1.0)
    corner = np.array([int(right[np.argmax(mesh.coords[right, 1])])])
    mesh.nodesets["corner"] = corner.astype(np.int32)

    def sink(q, X0, params):
        return jnp.asarray([0.5 * q[0] ** 4])

    prob2.add_point_load("corner", "temperature", sink)
    prob2.finalize()
    res2 = NewtonSolver(prob2, NewtonOptions(max_iter=12, tol_residual=1e-12,
                                             linear_solver="direct")).solve(
        np.full(prob2.dofmap.n_dof, 1.0), prob2.base_params())
    assert res2.converged and res2.iters <= 5, res2.summary()
    # the sink pulls the corner below the Dirichlet level
    Tc = prob2.get_nodal_field(res2.x, "temperature", 0)[corner[0]]
    assert Tc < 1.0
