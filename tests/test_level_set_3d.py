"""3D level set: marching-tet facets, exact-distance renormalization,
volume-preserving renormalization, and a 3D static bubble (Stokes + CSF,
Laplace jump 2 sigma / R).

Parity: reference ``find_facets`` handles 3D (src/mm_fill_ls.c:3364);
HUYGENS renormalization (src/mm_fill_ls.c:497); the CSF kernels here are
dimension-generic, so this validates the whole 3D two-phase path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh
from goma_tpu.physics import (Continuity, CSFSurfaceTension, FillEquation,
                              Momentum, renormalize, renormalize_mass)
from goma_tpu.physics import level_set as ls
from goma_tpu.physics.level_set import (FILL_VAR, interface_facets,
                                        ls_volume)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _sphere_field(coords, c, R):
    return np.linalg.norm(coords - np.asarray(c), axis=1) - R


def test_facets_3d_sphere_area():
    """Marching-tet triangles of a sphere's signed distance tile the sphere:
    total triangle area -> 4 pi R^2 and every vertex sits on the sphere."""
    R = 0.55
    mesh = box_mesh(10, 10, 10, elem="HEX8", xlim=(-1, 1), ylim=(-1, 1),
                    zlim=(-1, 1))
    F = _sphere_field(mesh.coords, (0.0, 0.0, 0.0), R)
    tris = interface_facets(mesh, F)
    assert tris.shape[0] > 0 and tris.shape[1:] == (3, 3)
    # vertices lie on the zero contour of the linear interpolant; chord
    # error on the h*sqrt(3) tet diagonals is (h*sqrt(3))^2/(8R) ~ 0.027
    rad = np.linalg.norm(tris.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(rad, R, atol=0.035)
    area = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=1
    ).sum()
    # inscribed triangulation underestimates area by O(h^2/R^2) ~ 3-4%
    np.testing.assert_allclose(area, 4 * np.pi * R**2, rtol=0.05)


def test_renormalize_3d_exact_distance():
    """A distorted (non-distance) field with a spherical zero contour
    renormalizes to the exact signed distance everywhere."""
    R, c = 0.5, (0.1, 0.0, -0.05)
    errs = []
    for n in (8, 12):
        mesh = box_mesh(n, n, n, elem="HEX8", xlim=(-1, 1), ylim=(-1, 1),
                        zlim=(-1, 1))
        d = _sphere_field(mesh.coords, c, R)
        # monotone distortion keeping the same zero contour
        F = d * (1.0 + 2.0 * d**2) + 0.5 * d * np.cos(mesh.coords[:, 0])
        Fr = renormalize(mesh, F)
        errs.append(np.abs(Fr - d).max())
    # error is the O(h^2) facet-contouring error and must shrink with h
    assert errs[0] < 0.06 and errs[1] < 0.030, errs
    assert errs[1] < 0.6 * errs[0], errs


def test_renormalize_mass_3d_preserves_volume():
    R = 0.5
    mesh = box_mesh(8, 8, 8, elem="HEX8", xlim=(-1, 1), ylim=(-1, 1),
                    zlim=(-1, 1))
    d = _sphere_field(mesh.coords, (0.0, 0.0, 0.0), R)
    F = 3.0 * d + d**3  # distorted
    eps = 0.3
    V0 = ls_volume(mesh, F, eps)
    Fm = renormalize_mass(mesh, F, eps)
    V1 = ls_volume(mesh, Fm, eps)
    np.testing.assert_allclose(V1, V0, rtol=1e-8)


def test_csf_static_bubble_3d_pressure_jump():
    """3D static bubble: Stokes + dimension-generic CSF must produce the
    Laplace pressure jump 2 sigma / R (kappa = 2/R in 3D)."""
    sigma, R = 1.0, 0.5
    mesh = box_mesh(5, 5, 5, elem="HEX27", xlim=(-1, 1), ylim=(-1, 1),
                    zlim=(-1, 1))
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [Momentum(dim=3, interp="Q2", transient=False, convection=False),
           Continuity(interp="Q1"),
           FillEquation(interp="Q2", supg=0.0, transient=False),
           CSFSurfaceTension(dim=3, sigma=sigma)]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0,
                       lambda X: R - np.linalg.norm(X, axis=1))
    for nsn in ("left", "right", "front", "back", "top", "bottom"):
        for comp in range(3):
            prob.add_dirichlet(nsn, "velocity", comp, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    params = prob.base_params(ls_eps=jnp.asarray(0.3, dtype=prob.dtype))
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=6, linear_solver="direct", tol_residual=1e-8)
    ).solve(np.zeros(prob.dofmap.n_dof), params)
    assert res.converged
    p = prob.get_nodal_field(res.x, "pressure")
    # pressure is Q1: only corner nodes carry a dof; pick the nearest ones
    rr = np.where(np.isfinite(p), np.linalg.norm(mesh.coords, axis=1), np.inf)
    center = int(np.argmin(rr))
    rc = np.where(np.isfinite(p), np.linalg.norm(
        mesh.coords - np.array([-1.0, -1.0, -1.0]), axis=1), np.inf)
    corner = int(np.argmin(rc))
    jump = p[center] - p[corner]
    exact = 2.0 * sigma / R
    assert abs(jump - exact) < 0.12 * exact, (jump, exact)
