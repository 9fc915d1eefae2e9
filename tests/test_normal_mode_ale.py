"""Deforming-mesh (free-surface) 3D-of-2D LSA vs the exact Stokes
dispersion for film leveling.

Reference analog: LSA_3D_OF_2D with mesh mode equations
(src/ac_stability_util.c do_LSA_mods). Validation: a viscous film of depth
H with a no-slip bottom and a free capillary top has z-periodic surface
modes eta cos(beta z) decaying at the exact (quasi-static Stokes) rate

    s = -( (sigma beta^2 + rho g) / (2 mu beta) )
        (sinh q cosh q - q) / (cosh^2 q + q^2),   q = beta H

(capillary leveling: Orchard-type dispersion; lubrication limit
s -> -(sigma beta^4 + rho g beta^2) H^3 / (3 mu) as q -> 0). Derived
independently here from the biharmonic streamfunction pencil in
scripts/exp_film_lsa.py; gravity enters the FEM only through the
displaced-domain body-force AD coupling — no gravity-specific mode kernel
exists, so matching the g-dependence validates J0's mesh sensitivities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from goma_tpu.bc import CapillaryBC, KinematicBC
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    CapillaryZNormal,
    Continuity,
    EllipticMesh,
    Momentum,
    zmode_equations,
)
from goma_tpu.continuation.stability import (
    solve_stability,
    solve_stability_3d_of_2d_ale,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver

H = 1.0
MU = 1.0
SIG = 1.0


def s_exact(beta, g=0.0, rho=0.0):
    q = beta * H
    drive = SIG * beta**2 + rho * g
    return -(drive / (2 * MU * beta)) * (
        np.sinh(q) * np.cosh(q) - q) / (np.cosh(q) ** 2 + q**2)


def film_problem(rho, g=0.0, ny=12, zmode=True):
    mesh = rectangle_mesh(2, ny, elem="QUAD9", xlim=(0, 0.25), ylim=(0, H))
    eqs = [Momentum(dim=2, interp="Q2", transient=True),
           Continuity(interp="Q1"),
           EllipticMesh(dim=2, interp="Q2")]
    if zmode:
        eqs += zmode_equations(dim=2)
    mat = {"rho": rho, "mu": MU, "sigma": SIG}
    if g:
        mat["body_force"] = np.array([0.0, -g])
    prob = Problem(mesh, eqs, mat)
    for c in (0, 1):
        prob.add_dirichlet("bottom", "velocity", c, 0.0)
        prob.add_dirichlet("bottom", "mesh_displacement", c, 0.0)
    if zmode:
        prob.add_dirichlet("bottom", "nm_w", 0, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
    prob.add_face_kernel("top", CapillaryBC(dim=2))
    prob.add_face_kernel("top", KinematicBC(dim=2))
    if zmode:
        prob.add_face_kernel("top", CapillaryZNormal(dim=2))
    prob.finalize()
    return prob


def test_capillary_film_leveling_dispersion():
    """Pure capillary (trivial zero base state): exact to <0.1% from the
    lubrication regime through q = 1.5."""
    prob = film_problem(rho=1e-6)
    x0 = np.zeros(prob.dofmap.n_dof)
    for b in (0.4, 1.5):
        se = s_exact(b)
        r = solve_stability(prob, x0, prob.base_params(beta=jnp.asarray(b)),
                            n_modes=4, shift=se)
        s = r.growth_rates.real.max()
        assert abs(s - se) < 1e-3 * abs(se), (b, s, se)


def test_gravity_capillary_film_dispersion():
    """Gravity doubles the driving at rho*g = sigma*beta^2; the FEM gets the
    gravity restoring force purely from AD of the body force over the
    displaced domain (hydrostatic base pressure solved, embedded into the
    extended problem by the sweep driver)."""
    rho, b = 0.01, 0.4
    g = SIG * b**2 / rho  # rho*g = sigma*beta^2: doubles the decay rate
    base = film_problem(rho, g=g, zmode=False)
    res = NewtonSolver(base, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(base.dofmap.n_dof), base.base_params())
    assert res.converged
    # base state: u = 0, d = 0, hydrostatic pressure
    p = base.get_nodal_field(res.x, "pressure")
    nodes = np.where(~np.isnan(p))[0]
    np.testing.assert_allclose(
        p[nodes], rho * g * (H - base.mesh.coords[nodes, 1]), atol=1e-8)

    ext = film_problem(rho, g=g, zmode=True)
    se = s_exact(b, g=g, rho=rho)
    out = solve_stability_3d_of_2d_ale(ext, base, res.x, [b],
                                       n_modes=4, shift=se)
    _, s, _ = out[0]
    assert abs(s - se) < 0.02 * abs(se), (s, se)
    # and it is genuinely ~2x the capillary-only rate
    assert abs(s / s_exact(b) - 2.0) < 0.05
