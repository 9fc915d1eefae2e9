"""End-to-end slice 1: Poisson (steady heat conduction) with manufactured
solution — exercises dofmap, assembly, AD Jacobian, Dirichlet, linear solve.
This is the framework analog of the reference's simplest conduction decks."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def make_problem(nx=8, ny=8, elem="QUAD9", solver="gmres"):
    mesh = rectangle_mesh(nx, ny, elem=elem)

    def source(fv, mat, params):
        x, y = fv.x[:, 0], fv.x[:, 1]
        return 2 * jnp.pi**2 * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    interp = "Q2" if elem in ("QUAD9", "TRI6") else "Q1"
    eqs = [Energy(interp=interp, transient=False, convection=False)]
    mat = {"rho": 1.0, "Cp": 1.0, "k": 1.0, "heat_source": source}
    prob = Problem(mesh, eqs, mat)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return mesh, prob


@pytest.mark.parametrize("elem", ["QUAD9", "QUAD4", "TRI6", "TRI3"])
def test_poisson_manufactured(elem):
    mesh, prob = make_problem(10, 10, elem=elem)
    solver = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11, linear_tol=1e-12))
    x0 = np.zeros(prob.dofmap.n_dof)
    res = solver.solve(x0, prob.base_params())
    assert res.converged, res.summary()
    # linear problem: one Newton step
    assert res.iters <= 2

    exact = np.sin(np.pi * mesh.coords[:, 0]) * np.sin(np.pi * mesh.coords[:, 1])
    sv = prob.dofmap.svar("temperature")
    dofs = prob.dofmap.dof_of_node_svar[:, sv]
    ok = dofs >= 0
    err = np.max(np.abs(res.x[dofs[ok]] - exact[ok]))
    tol = {"QUAD9": 2e-4, "TRI6": 2e-4, "QUAD4": 2e-2, "TRI3": 2e-2}[elem]
    assert err < tol, f"{elem}: max nodal error {err}"


def test_poisson_direct_matches_gmres():
    _, prob = make_problem(6, 6)
    x0 = np.zeros(prob.dofmap.n_dof)
    r1 = NewtonSolver(prob, NewtonOptions(linear_solver="direct", max_iter=3)).solve(
        x0, prob.base_params()
    )
    r2 = NewtonSolver(
        prob, NewtonOptions(linear_solver="gmres", max_iter=3, linear_tol=1e-13)
    ).solve(x0, prob.base_params())
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-8)


def test_jacobian_vs_finite_difference():
    """The reference's numerical-Jacobian self-check (src/mm_numjac.c:716),
    inverted: our AD Jacobian is validated against finite differences."""
    _, prob = make_problem(3, 3)
    rng = np.random.RandomState(0)
    x = rng.rand(prob.dofmap.n_dof)
    params = prob.base_params()
    R0, vals = prob.assemble(x, params)
    R0 = np.asarray(R0)
    A = np.zeros((prob.dofmap.n_dof, prob.dofmap.n_dof))
    pat = prob.pattern
    A[pat.rows, pat.indices] = np.asarray(vals)
    h = 1e-7
    cols = rng.choice(prob.dofmap.n_dof, size=12, replace=False)
    for j in cols:
        xp = x.copy()
        xp[j] += h
        Rp = np.asarray(prob.residual(xp, params))
        # note: residual() skips Dirichlet surgery on J but applies to R
        fd = (Rp - R0) / h
        np.testing.assert_allclose(A[:, j], fd, atol=5e-6)
