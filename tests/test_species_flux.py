"""Stefan-Maxwell, generalized-Fickian, and hydrodynamic (shear-induced
migration) species flux models.

Reference behaviors validated:
- binary Stefan-Maxwell == Fickian with D12 (exact linear steady profile);
- pointwise SM fluxes satisfy the SM relations + closure sum(J)=0;
- Phillips migration reaches the analytic steady invariant
  gd * Y * mu_rel(Y)^(Kmu/Kc) = const (Phillips et al. 1992);
- AD Jacobians match finite differences (mm_numjac parity role).
"""

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    GeneralizedFickianSpecies,
    HydroSpecies,
    ProjectionEquation,
    StefanMaxwellSpecies,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check


def test_binary_stefan_maxwell_is_fickian():
    """ns=2 (one solved mole fraction): SM reduces to J1 = -c D12 grad x1,
    so steady no-source diffusion between Dirichlet plates is linear in x."""
    mesh = rectangle_mesh(6, 2, elem="QUAD4")
    eq = StefanMaxwellSpecies(1, D=[[0.0, 0.7], [0.7, 0.0]], c_total=2.0,
                              transient=False, convection=False)
    prob = Problem(mesh, [eq], {})
    prob.add_dirichlet("left", "species", 0, 0.2)
    prob.add_dirichlet("right", "species", 0, 0.6)
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0, 0.4)
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        jnp.asarray(x0), prob.base_params())
    assert res.converged
    Y = prob.get_nodal_field(res.x, "species", 0)
    expect = 0.2 + 0.4 * mesh.coords[:, 0]
    np.testing.assert_allclose(Y, expect, atol=1e-9)


def test_ternary_sm_fluxes_satisfy_relations():
    """Solve the pointwise SM system directly and verify the original
    relations grad x_i = sum_j (x_i J_j - x_j J_i)/(c D_ij) plus closure."""
    eq = StefanMaxwellSpecies(
        2, D=[[0.0, 1.0, 2.0], [1.0, 0.0, 0.5], [2.0, 0.5, 0.0]], c_total=1.5)
    x = jnp.array([[0.3, 0.5, 0.2]])
    gx = jnp.array([[[0.1, -0.2], [0.05, 0.3], [-0.15, -0.1]]])
    J = np.asarray(eq._fluxes(x, gx))[0]  # (3, dim)
    np.testing.assert_allclose(J.sum(axis=0), 0.0, atol=1e-12)
    c = 1.5
    D = np.array([[np.inf, 1.0, 2.0], [1.0, np.inf, 0.5], [2.0, 0.5, np.inf]])
    xs = np.asarray(x)[0]
    for i in range(2):  # the last relation was replaced by the closure
        rhs = sum(
            (xs[i] * J[j] - xs[j] * J[i]) / (c * D[i, j])
            for j in range(3) if j != i
        )
        np.testing.assert_allclose(np.asarray(gx)[0, i], rhs, atol=1e-12)


def test_generalized_fickian_cross_diffusion():
    """Two species with cross-diffusion: verify AD Jacobian and that a
    manufactured linear field is an exact steady solution."""
    mesh = rectangle_mesh(4, 3, elem="QUAD4")
    D = [[1.0, 0.3], [0.1, 0.5]]
    eq = GeneralizedFickianSpecies(2, D=D, transient=False, convection=False)
    prob = Problem(mesh, [eq], {})
    def linear_fn(a, b):
        return lambda X: a + b * X[:, 0]

    for w, (a, b) in enumerate([(0.1, 0.5), (0.9, -0.4)]):
        for ns, val in (("left", a), ("right", a + b)):
            prob.add_dirichlet(ns, "species", w, val)
        prob.add_dirichlet("bottom", "species", w, linear_fn(a, b))
        prob.add_dirichlet("top", "species", w, linear_fn(a, b))
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        jnp.asarray(x0), prob.base_params())
    assert res.converged
    for w, (a, b) in enumerate([(0.1, 0.5), (0.9, -0.4)]):
        Y = prob.get_nodal_field(res.x, "species", w)
        np.testing.assert_allclose(Y, a + b * mesh.coords[:, 0], atol=1e-9)


def _phillips_problem(Kc, Kmu):
    mesh = rectangle_mesh(2, 12, elem="QUAD4")

    def gd_source(fv, mat, params):
        y = fv.x[:, 1]
        return (1.0 + 2.0 * y)[:, None]

    eqs = [
        HydroSpecies(Kc=Kc, Kmu=Kmu, mu0=1.0, maxpack=0.68, nexp=-1.82,
                     convection=False),
        ProjectionEquation("shear_rate", 1, gd_source, interp="Q1"),
    ]
    return mesh, Problem(mesh, eqs, {})


def test_phillips_migration_steady_invariant():
    """Transient run to steady state; the Phillips model's steady balance is
    gd * Y * mu_rel^(Kmu/Kc) = const across the gap."""
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    Kc, Kmu = 0.41, 0.62
    mesh, prob = _phillips_problem(Kc, Kmu)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "species", 0, 0.3)
    x0 = prob.set_nodal_field(x0, "shear_rate", 0,
                              lambda X: 1.0 + 2.0 * X[:, 1])
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=10, tol_residual=1e-10, linear_solver="direct"),
        TimeOptions(dt0=0.05, t_end=60.0, adapt=True, max_dt=8.0, theta=0.0),
    )
    res = ts.run(jnp.asarray(x0), prob.base_params())
    Y = prob.get_nodal_field(res.x, "species", 0)
    gd = 1.0 + 2.0 * mesh.coords[:, 1]
    mu_rel = np.maximum(1.0 - Y / 0.68, 1e-2) ** (-1.82)
    inv = gd * Y * mu_rel ** (Kmu / Kc)
    # invariant constant to ~1% across the gap at steady state
    assert inv.std() / inv.mean() < 0.02, inv
    # mass conserved by the pure-flux form
    assert abs(Y.mean() - 0.3) < 5e-3


def test_species_flux_jacobians_match_fd():
    mesh, prob = _phillips_problem(0.41, 0.62)
    prob.finalize()
    rng = np.random.RandomState(3)
    x = np.zeros(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "species", 0, 0.25 + 0.1 * rng.rand(mesh.n_nodes))
    x = prob.set_nodal_field(x, "shear_rate", 0, 1.0 + rng.rand(mesh.n_nodes))
    chk = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=12)
    assert chk.ok, chk.report()

    mesh2 = rectangle_mesh(3, 3, elem="QUAD4")
    eq = StefanMaxwellSpecies(
        2, D=[[0.0, 1.0, 2.0], [1.0, 0.0, 0.5], [2.0, 0.5, 0.0]],
        transient=False, convection=False)
    prob2 = Problem(mesh2, [eq], {})
    prob2.add_dirichlet("left", "species", 0, 0.3)
    prob2.finalize()
    x2 = np.zeros(prob2.dofmap.n_dof)
    x2 = prob2.set_nodal_field(x2, "species", 0, 0.3 + 0.05 * rng.rand(mesh2.n_nodes))
    x2 = prob2.set_nodal_field(x2, "species", 1, 0.4 + 0.05 * rng.rand(mesh2.n_nodes))
    chk2 = numerical_jacobian_check(prob2, x2, prob2.base_params(), n_columns=12)
    assert chk2.ok, chk2.report()
