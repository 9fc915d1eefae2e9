"""Serendipity elements QUAD8/HEX20 (reference S_BIQUAD_QUAD / S_TRIQUAD_HEX,
src/el_elm_info.c; I_SP interpolation)."""

import numpy as np
import pytest

from goma_tpu.elements import element_type, eval_basis
from goma_tpu.elements.shapes import _hex_nodes, _quad_nodes
from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh, rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_s2_kronecker_and_partition_of_unity():
    qn = _quad_nodes(2)[:8]
    N, dN = eval_basis("quad", "S2", qn)
    np.testing.assert_allclose(N, np.eye(8), atol=1e-14)
    hn = _hex_nodes(2)[:20]
    N3, dN3 = eval_basis("hex", "S2", hn)
    np.testing.assert_allclose(N3, np.eye(20), atol=1e-14)
    rng = np.random.RandomState(0)
    for fam, nn in (("quad", 2), ("hex", 3)):
        pts = rng.uniform(-1, 1, size=(7, nn))
        N, dN = eval_basis(fam, "S2", pts)
        np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-13)
        np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-13)


def test_s2_quadratic_completeness():
    """Serendipity spaces contain all quadratic monomials except the
    bi/tri-quadratic bubbles: interpolation of x^2 + 2xy - y^2 is exact."""
    rng = np.random.RandomState(1)
    for fam, nodes in (("quad", _quad_nodes(2)[:8]), ("hex", _hex_nodes(2)[:20])):
        dim = nodes.shape[1]
        f = lambda p: p[:, 0] ** 2 + 2 * p[:, 0] * p[:, 1] - p[:, 1] ** 2
        vals = f(nodes)
        pts = rng.uniform(-1, 1, size=(9, dim))
        N, dN = eval_basis(fam, "S2", pts)
        np.testing.assert_allclose(N @ vals, f(pts), atol=1e-13)
        gx = dN[:, :, 0] @ vals
        gy = dN[:, :, 1] @ vals
        np.testing.assert_allclose(gx, 2 * pts[:, 0] + 2 * pts[:, 1], atol=1e-13)
        np.testing.assert_allclose(gy, 2 * pts[:, 0] - 2 * pts[:, 1], atol=1e-13)


@pytest.mark.parametrize("elem,dim", [("QUAD8", 2), ("HEX20", 3)])
def test_serendipity_laplace_quadratic_exact(elem, dim):
    """Laplace with harmonic quadratic solution u = x^2 - y^2: serendipity
    quadratics reproduce it to machine precision at the nodes."""
    if dim == 2:
        mesh = rectangle_mesh(3, 3, elem=elem)
        names = ("left", "right", "top", "bottom")
    else:
        mesh = box_mesh(2, 2, 2, elem=elem)
        names = ("left", "right", "top", "bottom", "front", "back")
    exact = lambda X: X[:, 0] ** 2 - X[:, 1] ** 2
    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in names:
        prob.add_dirichlet(ns, "temperature", 0, exact)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature")
    np.testing.assert_allclose(T, exact(mesh.coords), atol=1e-9)


def test_quad8_mixed_with_q1_pressure():
    """S2/Q1 mixed pair on QUAD8 (serendipity Taylor-Hood): Poiseuille exact."""
    from goma_tpu.physics import Continuity, Momentum

    mesh = rectangle_mesh(4, 3, elem="QUAD8", xlim=(0, 2), ylim=(0, 1))
    prob = Problem(
        mesh,
        [Momentum(2, interp="Q2", transient=False, convection=True), Continuity("Q1")],
        {"rho": 1.0, "mu": 1.0},
    )
    G = 4.0  # dp/dx = -G; u = G y (1-y) / (2 mu)
    uex = lambda X: G * X[:, 1] * (1 - X[:, 1]) / 2.0
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uex)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    pin = np.where(
        np.isclose(mesh.coords[:, 0], 2.0) & np.isclose(mesh.coords[:, 1], 0.0)
    )[0]
    prob.mesh.nodesets["pin"] = pin
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    np.testing.assert_allclose(u, uex(mesh.coords), atol=1e-8)
    p = prob.get_nodal_field(res.x, "pressure")
    ok = ~np.isnan(p)
    np.testing.assert_allclose(p[ok], G * (2.0 - mesh.coords[ok, 0]), atol=1e-7)
