"""PERIODIC_BC (reference ``include/rf_bc_const.h``, realized there through
PETSc matrix constraints): here periodic pairs SHARE dofs (dofmap node
aliasing), so periodicity is exact and conservative with zero extra rows.

Validations:
- Poisson with a periodic-in-x manufactured solution (exact nodal match of
  the periodic pair values + convergence to the smooth solution);
- body-force-driven Poiseuille in a periodic channel (no inflow/outflow
  BCs at all — the classic periodic-cell configuration);
- doubly-periodic corner chaining (union-find roots).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from goma_tpu.fem import Problem
from goma_tpu.fem.equations import Equation
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


class _PoissonMMS(Equation):
    """-lap(u) = f, f = (2 pi)^2 sin(2 pi x) * cosh-free 1D forcing."""

    def __init__(self, interp="Q2"):
        super().__init__("temperature", 1, interp)

    def residual(self, fv, mat, params):
        gT = fv.grad["temperature"][:, 0, :]
        gphi = fv.gphi["temperature"]
        phi = fv.phi["temperature"]
        f = (2 * jnp.pi) ** 2 * jnp.sin(2 * jnp.pi * fv.x[:, 0])
        return (jnp.einsum("qk,qik->qi", gT, gphi)
                - f[:, None] * phi)[:, None, :]


def test_periodic_poisson_mms():
    mesh = rectangle_mesh(16, 4, elem="QUAD9")
    prob = Problem(mesh, [[_PoissonMMS()]], [{}])
    prob.add_periodic("left", "right")
    # pin the constant mode at one node
    mesh.nodesets["pin"] = np.array([np.argmin(
        np.abs(mesh.coords[:, 0] - 0.25) + np.abs(mesh.coords[:, 1]))],
        dtype=np.int32)
    xpin = mesh.coords[mesh.nodesets["pin"][0], 0]
    prob.add_dirichlet("pin", "temperature", 0,
                       float(np.sin(2 * np.pi * xpin)))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-12, linear_solver="direct")).solve(
        jnp.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    exact = np.sin(2 * np.pi * mesh.coords[:, 0])
    # periodic pair values identical by construction (shared dof)
    ln, rn = mesh.nodesets["left"], mesh.nodesets["right"]
    ly = np.argsort(mesh.coords[ln, 1]); ry = np.argsort(mesh.coords[rn, 1])
    np.testing.assert_array_equal(T[ln[ly]], T[rn[ry]])
    assert np.max(np.abs(T - exact)) < 2e-4


def test_periodic_channel_poiseuille():
    """Periodic-in-x channel driven purely by a body force G: the parabolic
    profile u = G y (H - y) / (2 mu) with NO inflow/outflow conditions."""
    G, mu, H = 2.0, 0.5, 1.0
    mesh = rectangle_mesh(6, 8, elem="QUAD9", xlim=(0, 2.0), ylim=(0, H))
    prob = Problem(
        mesh,
        [[Momentum(dim=2, transient=False), Continuity()]],
        [{"rho": 1.0, "mu": mu, "body_force": [G, 0.0]}])
    prob.add_periodic("left", "right", translation=[2.0, 0.0])
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-11, linear_solver="direct")).solve(
        jnp.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    v = prob.get_nodal_field(res.x, "velocity", 1)
    y = mesh.coords[:, 1]
    u_exact = G * y * (H - y) / (2 * mu)
    assert np.max(np.abs(u - u_exact)) < 1e-9 * max(1.0, np.max(np.abs(u_exact)))
    assert np.max(np.abs(v)) < 1e-9
    # the iterative fast path must handle shared dofs too: padded matvec
    # (slave reads + root write-back fold) and the stabilized Galerkin
    # coarse (equal-order coarse has an EXACT checkerboard pressure mode on
    # periodic decks; TwoLevel.coarse_reg bounds it)
    res2 = NewtonSolver(prob, NewtonOptions(
        max_iter=10, tol_residual=1e-9, linear_solver="gmres",
        precond="twolevel", linear_tol=1e-8, gmres_restart=200,
        linear_maxiter=800)).solve(
        jnp.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res2.converged
    u2 = prob.get_nodal_field(res2.x, "velocity", 0)
    assert np.max(np.abs(u2 - u_exact)) < 1e-7


def test_doubly_periodic_corner_chain():
    """Fully periodic unit cell: all four corners collapse to ONE dof."""
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [[_PoissonMMS(interp="Q1")]], [{}])
    prob.add_periodic("left", "right")
    prob.add_periodic("bottom", "top")
    mesh.nodesets["pin"] = np.array([5], dtype=np.int32)  # interior node
    prob.add_dirichlet("pin", "temperature", 0, 0.0)
    prob.finalize()
    dm = prob.dofmap
    corners = [np.argmin(np.sum(np.abs(mesh.coords - np.array(c)), axis=1))
               for c in ((0, 0), (1, 0), (0, 1), (1, 1))]
    dofs = {int(dm.dof_of_node_svar[c, dm.svar("temperature", 0)])
            for c in corners}
    assert len(dofs) == 1
    # and the system still solves (singular-mode pinned)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=4, tol_residual=1e-11, linear_solver="direct")).solve(
        jnp.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
