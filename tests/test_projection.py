"""Segregated projection (pressure-correction) method.

Parity: mm_fill_split.c u*/p* kernels + rf_solve_segregated projection path.
Validation: transient startup of body-force-driven Poiseuille flow — the
series solution u(y,t) = G/(2mu) y(1-y) - sum_k 4G/(mu pi^3 k^3)
sin(k pi y) exp(-nu k^2 pi^2 t) (k odd), and the steady parabola at large t.
"""

import numpy as np

from goma_tpu.mesh import rectangle_mesh
from goma_tpu.solvers.projection import ProjectionSolver


def poiseuille_exact(y, t, G, mu, rho, nmax=61):
    nu = mu / rho
    u = G / (2 * mu) * y * (1 - y)
    for k in range(1, nmax, 2):
        u -= (4 * G / (mu * np.pi**3 * k**3)) * np.sin(k * np.pi * y) * np.exp(
            -nu * k**2 * np.pi**2 * t)
    return u


def test_projection_startup_poiseuille():
    G, mu, rho = 1.0, 1.0, 1.0
    mesh = rectangle_mesh(3, 10, elem="QUAD9", xlim=(0, 0.6), ylim=(0, 1))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)

    def bc_u(prob):
        for ns in ("top", "bottom"):
            prob.add_dirichlet(ns, "ustar", 0, 0.0)
        for ns in ("top", "bottom", "left", "right"):
            prob.add_dirichlet(ns, "ustar", 1, 0.0)

    def bc_p(prob):
        prob.add_dirichlet("pin", "pphi", 0, 0.0)

    mat = {"rho": rho, "mu": mu, "body_force": (G, 0.0)}
    ps = ProjectionSolver(mesh, mat, bc_u, bc_p)
    u0 = np.zeros((mesh.n_nodes, 2))
    p0 = np.zeros(mesh.n_nodes)

    dt, nt = 0.005, 40  # t = 0.2: transient still active
    res = ps.run(u0, p0, dt, nt)
    y = mesh.coords[:, 1]
    exact = poiseuille_exact(y, res.t, G, mu, rho)
    err = np.max(np.abs(res.u[:, 0] - exact))
    assert err < 4e-3, err  # first-order splitting error O(dt)
    assert np.max(np.abs(res.u[:, 1])) < 2e-3

    # march to steady state: exact parabola
    res2 = ps.run(res.u, res.p, 0.02, 120)
    exact_inf = G / (2 * mu) * y * (1 - y)
    assert np.max(np.abs(res2.u[:, 0] - exact_inf)) < 2e-3
