"""Solved auxiliary-field equations: normals, bond evolution, vorticity
direction.

Anchors:
- assemble_normals (src/mm_fill_terms.c:1876): solved nodal normal field
  n = grad F / |grad F| — exact radial normals for a circle distance.
- assemble_bond_evolution (src/mm_std_models.c:5929, Mujumdar 2002):
  homogeneous steady shear equilibrium nn = k2 gd^b n0/(k1 gd^a + k2 gd^b).
- bond_viscosity (src/mm_viscosity.c:2770): mu(nn) closure values.
- assemble_vorticity_direction (src/mm_qtensor_model.c:671): planar shear
  vorticity direction = e_z; q = I - vd vd^T/2 (assemble_qtensor :141).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from goma_tpu.fem import Problem
from goma_tpu.fem.equations import Equation
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (BondEvolution, SolvedNormal,
                              VorticityDirection)
from goma_tpu.physics.level_set import FILL_VAR, NORMAL_VAR
from goma_tpu.physics.materials import BondViscosity
from goma_tpu.physics.suspension import qtensor_from_vort_dir
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from tests.test_ext_velocity import Frozen, Project


def _solve(prob, x0, params=None, tol=1e-11, it=6):
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=it, tol_residual=tol, linear_solver="direct")).solve(
        jnp.asarray(x0), params or prob.base_params())
    assert res.converged, res.summary()
    return res


def test_solved_normals_circle():
    """F = distance to a circle centered outside the domain: solved
    normals = radial unit vectors (smooth everywhere inside)."""
    cx, cy, R = -0.25, 0.5, 0.4
    mesh = rectangle_mesh(12, 12, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    dist = lambda c: np.sqrt((c[:, 0] - cx) ** 2 + (c[:, 1] - cy) ** 2) - R
    prob = Problem(mesh, [Frozen(FILL_VAR, interp="Q2"),
                          SolvedNormal(2, interp="Q2")], {})
    prob.add_dirichlet("all", FILL_VAR, 0, dist)
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), FILL_VAR, 0, dist)
    res = _solve(prob, x0)
    n1 = prob.get_nodal_field(res.x, NORMAL_VAR, 0)
    n2 = prob.get_nodal_field(res.x, NORMAL_VAR, 1)
    xy = mesh.coords
    r = np.sqrt((xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2)
    # Q2 distance field is not exactly radial between nodes -> projection
    # error O(h^2); interior nodes tight
    np.testing.assert_allclose(n1, (xy[:, 0] - cx) / r, atol=5e-3)
    np.testing.assert_allclose(n2, (xy[:, 1] - cy) / r, atol=5e-3)


def test_bond_evolution_shear_equilibrium():
    """Frozen simple shear u = (gd0*y, 0); steady bond equation recovers
    the uniform Mujumdar equilibrium structure."""
    gd0, k1, k2, n0, a, b = 2.0, 1.5, 0.8, 1.0, 1.2, 0.7
    uex = lambda x: jnp.stack([gd0 * x[:, 1], 0.0 * x[:, 0]], axis=1)
    mesh = rectangle_mesh(6, 6, elem="QUAD4")
    prob = Problem(mesh, [Project("velocity", uex, ncomp=2),
                          BondEvolution(k1, k2, n0, aexp=a, bexp=b,
                                        transient=False)], {})
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "bond", 0, 0.5)
    res = _solve(prob, x0, it=15)
    nn = prob.get_nodal_field(res.x, "bond", 0)
    nn_eq = k2 * gd0 ** b * n0 / (k1 * gd0 ** a + k2 * gd0 ** b)
    np.testing.assert_allclose(nn, nn_eq, rtol=1e-8)


def test_bond_viscosity_closure():
    """mu(nn) at nn=1 -> mu0; nn=0 -> mu_inf; yield term adds
    nn*tau_y*(1-exp(-F gd))/gd."""

    class FV:
        pass

    fv = FV()
    nn = jnp.array([0.0, 1.0, 0.5])
    fv.val = {"bond": nn[:, None]}
    # uniform shear rate gd = 2.0: grad u = [[0, 2], [0, 0]]
    g = jnp.zeros((3, 2, 2)).at[:, 0, 1].set(2.0)
    fv.grad = {"velocity": g}
    mu0, mu_inf, tau_y, fexp = 10.0, 1.0, 3.0, 0.9
    mu = BondViscosity(mu0, mu_inf, aexp=1.0, tau_y=tau_y, fexp=fexp)(
        fv, {}, {})
    gd = 2.0
    yield_v = tau_y * (1.0 - np.exp(-fexp * gd)) / gd
    np.testing.assert_allclose(mu[0], mu_inf, rtol=1e-12)
    np.testing.assert_allclose(mu[1], mu0 + 1.0 * yield_v, rtol=1e-10)
    np.testing.assert_allclose(mu[2], mu_inf + 0.5 * (mu0 - mu_inf)
                               + 0.5 * yield_v, rtol=1e-10)


def test_vorticity_direction_planar_shear():
    """u = (y, 0): gamma_dot has eigenvalues (-1, 0, +1) embedded in 3x3;
    the middle (vorticity) eigenvector is e_z. q = diag(1, 1, 1/2)."""
    uex = lambda x: jnp.stack([x[:, 1], 0.0 * x[:, 0]], axis=1)
    mesh = rectangle_mesh(5, 5, elem="QUAD4")
    prob = Problem(mesh, [Project("velocity", uex, ncomp=2),
                          VorticityDirection()], {})
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    res = _solve(prob, x0, it=10)
    vd = np.stack([prob.get_nodal_field(res.x, "vort_dir", a)
                   for a in range(3)], axis=1)
    ez = np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.abs(vd @ ez), 1.0, atol=1e-9)
    np.testing.assert_allclose(vd[:, :2], 0.0, atol=1e-9)

    class FV:
        pass

    fv = FV()
    fv.val = {"vort_dir": jnp.asarray(vd)}
    q = qtensor_from_vort_dir(fv)
    np.testing.assert_allclose(q[0], np.diag([1.0, 1.0, 0.5]), atol=1e-9)
