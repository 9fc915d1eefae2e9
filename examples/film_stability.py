"""Deforming-mesh (free-surface) 3D-of-2D linear stability: gravity-
capillary film leveling.

The 2D cross-section of a viscous film (depth H, no-slip floor, free
capillary surface) is solved as an ALE base state; z-periodic surface
perturbations eta cos(beta z) are then analyzed with the normal-mode
extension (goma_tpu.physics.normal_mode_ale): J(beta) is the AD Jacobian
of the real ALE problem — every mesh-position sensitivity, the kinematic
and capillary couplings, and the displaced-domain gravity all ride AD —
plus explicit z-derivative correction kernels and the out-of-plane
capillary curvature face term.

Exact quasi-static Stokes dispersion (Orchard-type; q = beta H):

    s(beta) = -((sigma beta^2 + rho g) / (2 mu beta))
              (sinh q cosh q - q) / (cosh^2 q + q^2)

Reference analog: LSA_3D_OF_2D with mesh mode equations
(src/ac_stability_util.c do_LSA_mods).

Run: python examples/film_stability.py [ny]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(ny=12, betas=(0.2, 0.4, 0.8, 1.5), rho=0.01, g=8.0,
        mu=1.0, sigma=1.0, H=1.0):
    import jax.numpy as jnp

    from goma_tpu.bc import CapillaryBC, KinematicBC
    from goma_tpu.continuation.stability import solve_stability_3d_of_2d_ale
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (CapillaryZNormal, Continuity, EllipticMesh,
                                  Momentum, zmode_equations)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    def film(zmode):
        mesh = rectangle_mesh(2, ny, elem="QUAD9", xlim=(0, 0.25), ylim=(0, H))
        eqs = [Momentum(dim=2, interp="Q2", transient=True),
               Continuity(interp="Q1"), EllipticMesh(dim=2, interp="Q2")]
        if zmode:
            eqs += zmode_equations(dim=2)
        mat = {"rho": rho, "mu": mu, "sigma": sigma,
               "body_force": np.array([0.0, -g])}
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

    base = film(False)
    res = NewtonSolver(base, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(base.dofmap.n_dof), base.base_params())
    assert res.converged
    ext = film(True)

    def s_exact(b):
        q = b * H
        return -((sigma * b**2 + rho * g) / (2 * mu * b)) * (
            np.sinh(q) * np.cosh(q) - q) / (np.cosh(q) ** 2 + q**2)

    print(f"{'beta':>6} {'sigma (FEM)':>14} {'sigma (exact)':>14} {'err%':>7}")
    out = []
    for b in betas:
        se = s_exact(b)
        (_, s, _), = solve_stability_3d_of_2d_ale(
            ext, base, res.x, [b], n_modes=4, shift=se)
        out.append((b, s, se))
        print(f"{b:6.2f} {s:14.6e} {se:14.6e} {abs(s-se)/abs(se)*100:7.3f}")
    return out


if __name__ == "__main__":
    import jax

    # host-side eigensolve study: CPU + f64
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    ny = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    run(ny)
