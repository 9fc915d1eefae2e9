"""Fused hand-derived NS Q2/Q1 kernel (fem/fastns.py) vs the generic AD
path — the mm_numjac idea with AD as the oracle: residual and every
Jacobian entry must match to f64 roundoff."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum


def _pair(n=6, transient=False, convection=True, Re=100.0, distort=True):
    """(fast problem, generic problem) on the same (optionally distorted)
    mesh so per-element geometry actually varies."""
    out = []
    rng = np.random.RandomState(3)
    pert = None
    for enable in (True, False):
        mesh = rectangle_mesh(n, n, elem="QUAD9")
        if distort:
            if pert is None:
                interior = ((mesh.coords[:, 0] > 1e-9) & (mesh.coords[:, 0] < 1 - 1e-9)
                            & (mesh.coords[:, 1] > 1e-9) & (mesh.coords[:, 1] < 1 - 1e-9))
                pert = np.where(interior[:, None],
                                (rng.rand(*mesh.coords.shape) - 0.5) * 0.3 / n, 0.0)
            mesh.coords = mesh.coords + pert
        mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
        eqs = [Momentum(dim=2, interp="Q2", transient=transient,
                        convection=convection), Continuity(interp="Q1")]
        prob = Problem(mesh, eqs, {"rho": 1.3, "mu": 1.0 / Re})
        for ns in ("left", "right", "bottom"):
            prob.add_dirichlet(ns, "velocity", 0, 0.0)
            prob.add_dirichlet(ns, "velocity", 1, 0.0)
        prob.add_dirichlet("top", "velocity", 0, 1.0)
        prob.add_dirichlet("top", "velocity", 1, 0.0)
        prob.add_dirichlet("pin", "pressure", 0, 0.0)
        prob.enable_fast_kernels = enable
        prob.finalize()
        out.append(prob)
    return out


@pytest.mark.parametrize("transient,convection", [
    (False, True), (True, True), (False, False),
])
def test_fastns_matches_ad(transient, convection):
    fast, gen = _pair(transient=transient, convection=convection)
    assert fast._fast_meta and not gen._fast_meta
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(fast.dofmap.n_dof) * 0.7)
    params = fast.base_params()
    if transient:
        params["ct"] = jnp.asarray(1.5, dtype=fast.dtype)
        params["hist"] = jnp.asarray(rng.randn(fast.dofmap.n_dof) * 0.2,
                                     dtype=fast.dtype)
    pg = gen.base_params()
    pg["ct"], pg["hist"] = params["ct"], params["hist"]

    R1, v1 = fast._assemble(x, params)
    R2, v2 = gen._assemble(x, pg)
    sc = float(jnp.max(jnp.abs(R2))) + 1.0
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2),
                               atol=1e-13 * sc, rtol=0)
    scv = float(jnp.max(jnp.abs(v2))) + 1.0
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               atol=1e-13 * scv, rtol=0)

    # element path (the Krylov hot path) too
    Re1, ve1, aux1 = fast._assemble_with_elem(x, params)
    np.testing.assert_allclose(np.asarray(Re1), np.asarray(R2),
                               atol=1e-13 * sc, rtol=0)
    np.testing.assert_allclose(np.asarray(ve1), np.asarray(v2),
                               atol=1e-13 * scv, rtol=0)


def test_fastns_cavity_solution_identical():
    """End-to-end Newton: identical iterate path to the AD kernel."""
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    fast, gen = _pair(distort=False)
    x0 = np.zeros(fast.dofmap.n_dof)
    r1 = NewtonSolver(fast, NewtonOptions(max_iter=10, linear_solver="direct")
                      ).solve(x0, fast.base_params())
    r2 = NewtonSolver(gen, NewtonOptions(max_iter=10, linear_solver="direct")
                      ).solve(x0, gen.base_params())
    assert r1.converged and r2.converged
    assert r1.iters == r2.iters
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-10)


def test_fastns_not_matched_when_out_of_scope():
    """SUPG/PSPG, callable properties, body force -> generic path."""
    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    p1 = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False, supg=0.5),
                        Continuity(interp="Q1")], {"rho": 1.0, "mu": 0.1})
    p1.finalize()
    assert not p1._fast_meta
    mesh2 = rectangle_mesh(3, 3, elem="QUAD9")
    p2 = Problem(mesh2, [Momentum(dim=2, interp="Q2", transient=False),
                         Continuity(interp="Q1")],
                 {"rho": 1.0, "mu": lambda fv, mat, params: 0.1})
    p2.finalize()
    assert not p2._fast_meta
    mesh3 = rectangle_mesh(3, 3, elem="QUAD9")
    p3 = Problem(mesh3, [Momentum(dim=2, interp="Q2", transient=False),
                         Continuity(interp="Q1")],
                 {"rho": 1.0, "mu": 0.1, "body_force": (0.0, -1.0)})
    p3.finalize()
    assert not p3._fast_meta
