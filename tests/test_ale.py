"""ALE mesh motion tests.

1. Consistency: a coupled (temperature, mesh) solve with Dirichlet-driven
   mesh displacement must reproduce the pure Poisson solution computed on a
   mesh whose coordinates are displaced up front (validates the AD path
   through x = X0 + d, the analog of load_fv_mesh_derivs).
2. Young-Laplace relaxation: a perturbed free surface under surface tension
   + kinematic BC relaxes to a circular-arc meniscus whose pressure jump
   matches sigma*kappa (BASELINE config #3 machinery: capillary + ALE).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.bc import CapillaryBC, KinematicBC
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, EllipticMesh, Energy, Momentum, PseudoSolidMesh
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def _dx_fn(coords):
    x, y = coords[:, 0], coords[:, 1]
    return 0.08 * np.sin(np.pi * x) * y


@pytest.mark.parametrize("mesh_eq", ["elliptic", "pseudo_solid"])
def test_ale_consistency_with_premapped_mesh(mesh_eq):
    n = 6
    mesh = rectangle_mesh(n, n, elem="QUAD9")

    def source(fv, mat, params):
        x, y = fv.x[:, 0], fv.x[:, 1]
        return jnp.sin(jnp.pi * x) * jnp.cos(jnp.pi * y)

    meq = EllipticMesh(2) if mesh_eq == "elliptic" else PseudoSolidMesh(2)
    eqs = [Energy(interp="Q2", transient=False, convection=False), meq]
    mat = {"k": 1.0, "heat_source": source, "mesh_shear_modulus": 1.0, "mesh_lambda": 1.0}
    prob = Problem(mesh, eqs, mat)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
        # displaced boundary: dx prescribed, dy = 0
        prob.add_dirichlet(ns, "mesh_displacement", 0, lambda c: _dx_fn(c))
        prob.add_dirichlet(ns, "mesh_displacement", 1, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-11, linear_tol=1e-12,
                            linear_maxiter=2000)
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    # build the displaced mesh explicitly and solve pure Poisson on it
    dx = prob.get_nodal_field(res.x, "mesh_displacement", 0)
    dy = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    mesh2 = rectangle_mesh(n, n, elem="QUAD9")
    mesh2.coords = mesh2.coords + np.stack([dx, dy], axis=1)
    prob2 = Problem(mesh2, [Energy(interp="Q2", transient=False, convection=False)],
                    {"k": 1.0, "heat_source": source})
    for ns in ("left", "right", "top", "bottom"):
        prob2.add_dirichlet(ns, "temperature", 0, 0.0)
    prob2.finalize()
    res2 = NewtonSolver(
        prob2, NewtonOptions(max_iter=4, tol_residual=1e-11, linear_tol=1e-12)
    ).solve(np.zeros(prob2.dofmap.n_dof), prob2.base_params())
    assert res2.converged

    T1 = prob.get_nodal_field(res.x, "temperature")
    T2 = prob2.get_nodal_field(res2.x, "temperature")
    np.testing.assert_allclose(T1, T2, atol=1e-8)


def test_young_laplace_meniscus():
    """Perturbed free surface relaxes to a circular arc: pressure jump
    p = sigma * kappa and enclosed volume is conserved."""
    n = 8
    sigma = 1.0
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    eqs = [
        Momentum(dim=2, interp="Q2", transient=True),
        Continuity(interp="Q1"),
        EllipticMesh(2),
    ]
    mat = {"rho": 1.0, "mu": 1.0, "sigma": sigma}
    prob = Problem(mesh, eqs, mat)
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
        prob.add_dirichlet(ns, "mesh_displacement", 1, 0.0)
    prob.add_dirichlet("top", "mesh_displacement", 0, 0.0)  # surface nodes slide vertically
    prob.add_face_kernel("top", CapillaryBC(dim=2, p_ext=0.0))
    prob.add_face_kernel("top", KinematicBC(dim=2, penalty=1e4))
    prob.finalize()

    # initial bump on the free surface: dy = A sin(pi x) * y
    A = 0.05
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(
        x0, "mesh_displacement", 1,
        lambda c: A * np.sin(np.pi * c[:, 0]) * c[:, 1],
    )

    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=10, tol_residual=1e-9, linear_tol=1e-10, linear_maxiter=3000,
                      gmres_restart=100),
        TimeOptions(dt0=0.05, t_end=4.0, theta=0.0, adapt=True, eps_time=0.1,
                    rel_tol=1e-2, growth_cap=2.0, max_dt=1.0),
    )
    res = ts.run(x0, prob.base_params())

    dy_top = prob.get_nodal_field(res.x, "mesh_displacement", 1)
    top = mesh.nodesets["top"]
    xs = mesh.coords[top, 0]
    h = 1.0 + dy_top[top]

    # volume conservation: integral of initial bump = A * 2/pi
    vol_excess = np.trapezoid(h[np.argsort(xs)] - 1.0, np.sort(xs))
    np.testing.assert_allclose(vol_excess, A * 2 / np.pi, rtol=0.05)

    # circular arc of chord 1 with that segment area
    from scipy.optimize import brentq

    theta = brentq(lambda t: (t - np.sin(t)) / (8 * np.sin(t / 2) ** 2) * 1.0 - vol_excess,
                   1e-6, np.pi)
    R = 1.0 / (2 * np.sin(theta / 2))
    h_mid_exact = R - R * np.cos(theta / 2)
    mid = np.argmin(np.abs(xs - 0.5))
    np.testing.assert_allclose(h[mid] - 1.0, h_mid_exact, rtol=0.08)

    # Young-Laplace pressure jump: p approx sigma / R everywhere
    p = prob.get_nodal_field(res.x, "pressure")
    p = p[~np.isnan(p)]
    np.testing.assert_allclose(np.median(p), sigma / R, rtol=0.08)

    # fluid back at rest
    u = prob.get_nodal_field(res.x, "velocity", 0)
    assert np.nanmax(np.abs(u)) < 1e-3
