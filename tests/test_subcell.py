"""Subcell ("subgrid") quadrature + sharp level-set property integration
(reference get_subelement_integration_pts parity, src/mm_fill.c:664-678)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.elements import volume_rule
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy, FillEquation, LevelSetProperty, sharp_heaviside
from goma_tpu.physics.level_set import FILL_VAR
from goma_tpu.post.postproc import volume_integral
from goma_tpu.solvers import NewtonOptions, NewtonSolver


@pytest.mark.parametrize("family,vol", [("quad", 4.0), ("tri", 0.5), ("hex", 8.0)])
def test_subcell_rule_partitions_volume(family, vol):
    for nsub in (2, 3):
        pts, wts = volume_rule(family, ("subcell", nsub, 2))
        assert wts.sum() == pytest.approx(vol, rel=1e-13)
        # quadratic monomial integrates exactly (each subcell uses base=2)
        if family == "quad":
            val = np.sum(wts * pts[:, 0] ** 2 * pts[:, 1] ** 2)
            assert val == pytest.approx(4.0 / 9.0, rel=1e-13)
        if family == "tri":
            val = np.sum(wts * pts[:, 0] * pts[:, 1])
            assert val == pytest.approx(1.0 / 24.0, rel=1e-12)


def _phase_area(nsub, nmesh=4, base=3):
    """Integrate a sharp two-phase indicator over [0,1]^2 with the interface
    at x = 0.5 + 0.1234/nmesh (never mesh-aligned)."""
    xo = 0.5 + 0.1234 / nmesh
    mesh = rectangle_mesh(nmesh, nmesh, elem="QUAD4")
    qo = base if nsub == 0 else ("subcell", nsub, base)
    prob = Problem(
        mesh,
        [Energy(interp="Q1", transient=False, convection=False),
         FillEquation(interp="Q1", transient=False)],
        {"rho": 1.0, "Cp": 1.0, "k": 1.0},
        quad_order=qo,
    )
    prob.finalize()
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), FILL_VAR, 0,
                             lambda X: X[:, 0] - xo)
    ind = LevelSetProperty(0.0, 1.0, eps="sharp")
    f = volume_integral(prob, lambda fv, mat, params: ind(fv, mat, params))
    got = float(f(jnp.asarray(x), prob.base_params()))
    return got, 1.0 - xo


def test_sharp_area_subcell_convergence():
    errs = []
    for nsub in (0, 2, 6):
        got, exact = _phase_area(nsub)
        errs.append(abs(got - exact))
    # plain rule cannot see the off-point interface; subcell shrinks the
    # error roughly like 1/nsub
    assert errs[1] < 0.55 * errs[0]
    assert errs[2] < 0.45 * errs[1]
    # fine subgrid: error below 1% of the phase area
    assert errs[2] < 1e-2


def test_subcell_assembly_unchanged_for_smooth_problems():
    """Composite rule must reproduce the standard rule's answer on smooth
    problems (Poisson with harmonic exact solution)."""
    exact = lambda X: X[:, 0] ** 2 - X[:, 1] ** 2
    sol = {}
    for qo in (3, ("subcell", 2, 3)):
        mesh = rectangle_mesh(4, 4, elem="QUAD9")
        prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                       {"rho": 1.0, "Cp": 1.0, "k": 1.0}, quad_order=qo)
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, "temperature", 0, exact)
        prob.finalize()
        res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                               linear_solver="direct")).solve(
            np.zeros(prob.dofmap.n_dof), prob.base_params())
        assert res.converged
        sol[str(qo)] = prob.get_nodal_field(res.x, "temperature")
        np.testing.assert_allclose(sol[str(qo)], exact(mesh.coords), atol=1e-9)
