"""Nedelec (edge-element) curl-curl validation.

The H(curl)-conforming discretization of the time-harmonic wave equation
(reference: the I_N1 edge interpolation, include/mm_as_const.h, used by
src/mm_fill_em.c's curl-curl path). Dofs are tangential edge circulations
carried on the midside nodes of the quadratic parent element.

Tests:
  * patch test — a constant (curl-free) field is in the discrete space on an
    affine mesh, so the Galerkin solution reproduces it to solver tolerance;
  * manufactured TE-mode: curl curl E - E = (k^2-1) E_mn with PEC walls,
    checking circulation accuracy and h-convergence.
"""

import numpy as np

from goma_tpu.elements.shapes import NEDELEC_EDGE_CORNERS
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import EMWaveEdge
from goma_tpu.physics.em import EDGE_RE
from goma_tpu.solvers import NewtonOptions, NewtonSolver

# midside node carrying each edge's circulation dof per family
_EDGE_MIDS = {"quad": (4, 5, 6, 7), "tri": (3, 4, 5),
              "hex": tuple(range(8, 20))}


def _edge_list(mesh, family="quad"):
    """(midside_node -> (corner_lo, corner_hi)) for every unique edge; the
    GLOBAL dof direction is low -> high node id (edge-sign convention)."""
    conn = mesh.blocks[0].conn
    out = {}
    for (c0, c1), m in zip(NEDELEC_EDGE_CORNERS[family], _EDGE_MIDS[family]):
        for e in range(conn.shape[0]):
            a, b = int(conn[e, c0]), int(conn[e, c1])
            out[int(conn[e, m])] = (min(a, b), max(a, b))
    return out


def _exact_circulations(mesh, Efun, family="quad"):
    """Exact int E . t dl per edge (5-pt Gauss), keyed by midside node."""
    gp, gw = np.polynomial.legendre.leggauss(5)
    circ = {}
    for mid, (n0, n1) in _edge_list(mesh, family).items():
        p0, p1 = mesh.coords[n0], mesh.coords[n1]
        t = p1 - p0
        pts = p0[None, :] + (gp[:, None] + 1) / 2 * t[None, :]
        Ev = Efun(pts)  # (5, 2)
        circ[mid] = float(np.sum(gw / 2 * (Ev @ t)))
    return circ


def _solve(n, omega, source, pec, elem="QUAD9"):
    mesh = rectangle_mesh(n, n, elem=elem, xlim=(0, 1), ylim=(0, 1))
    prob = Problem(mesh, [EMWaveEdge("real", omega=omega)],
                   {"mu_m": 1.0, "eps": 1.0, "J_im": source})
    if pec:
        for ns in ("left", "right", "top", "bottom"):
            prob.add_dirichlet(ns, EDGE_RE, 0, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-12, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged and res.iters <= 2
    return mesh, prob, res


def test_edge_constant_patch():
    """E0 = (0.3, -0.7) solves curl curl E - E = -E0 with natural BCs; the
    constant is exactly in the lowest-order edge space on an affine mesh."""
    E0 = np.array([0.3, -0.7])

    mesh, prob, res = _solve(4, 1.0, tuple(-E0), pec=False)
    got = prob.get_nodal_field(res.x, EDGE_RE, 0)
    exact = _exact_circulations(mesh, lambda p: np.broadcast_to(E0, (len(p), 2)))
    for mid, c in exact.items():
        assert abs(got[mid] - c) < 1e-9, (mid, got[mid], c)


def _mode_problem(n, elem="QUAD9"):
    m_, n_ = 1, 1
    k2 = (m_ ** 2 + n_ ** 2) * np.pi ** 2

    def Efun(p):
        x, y = p[:, 0], p[:, 1]
        return np.stack([
            -n_ * np.pi * np.cos(m_ * np.pi * x) * np.sin(n_ * np.pi * y),
            m_ * np.pi * np.sin(m_ * np.pi * x) * np.cos(n_ * np.pi * y),
        ], axis=1)

    def source(fv, mat, params):
        # J_im = f / omega with omega = 1, f = (k^2 - 1) E_exact
        import jax.numpy as jnp
        x, y = fv.x[:, 0], fv.x[:, 1]
        Ex = -n_ * jnp.pi * jnp.cos(m_ * jnp.pi * x) * jnp.sin(n_ * jnp.pi * y)
        Ey = m_ * jnp.pi * jnp.sin(m_ * jnp.pi * x) * jnp.cos(n_ * jnp.pi * y)
        return (k2 - 1.0) * jnp.stack([Ex, Ey], axis=1)

    mesh, prob, res = _solve(n, 1.0, source, pec=True, elem=elem)
    fam = "tri" if elem.startswith("TRI") else "quad"
    got = prob.get_nodal_field(res.x, EDGE_RE, 0)
    exact = _exact_circulations(mesh, Efun, fam)
    mids = np.array(sorted(exact))
    g = got[mids]
    e = np.array([exact[m] for m in mids])
    return np.linalg.norm(g - e) / np.linalg.norm(e)


def test_edge_te_mode_convergence():
    e8 = _mode_problem(8)
    e16 = _mode_problem(16)
    assert e16 < 0.05, e16
    assert e8 / e16 > 1.7, (e8, e16)


def test_edge_te_mode_tri_whitney():
    """TRI6 meshes exercise the per-element edge-sign conjugation (the
    structured tri split has opposing edge orientations): same TE(1,1)
    mode, Whitney edge elements, O(h) convergence."""
    e8 = _mode_problem(8, elem="TRI6")
    e16 = _mode_problem(16, elem="TRI6")
    assert e16 < 0.06, e16
    assert e8 / e16 > 1.7, (e8, e16)


def test_edge_hex_3d_manufactured():
    """3D hex Nedelec: curl curl E - E = (2 pi^2 - 1) E with
    E = (0, 0, sin(pi x) sin(pi y)) and PEC walls — circulation convergence
    plus exact patch reproduction of a constant field."""
    from goma_tpu.mesh import box_mesh

    def run(n):
        mesh = box_mesh(n, n, n, elem="HEX27")

        def source(fv, mat, params):
            import jax.numpy as jnp
            x, y = fv.x[:, 0], fv.x[:, 1]
            Ez = jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
            z = jnp.zeros_like(Ez)
            return (2 * jnp.pi**2 - 1.0) * jnp.stack([z, z, Ez], axis=1)

        prob = Problem(mesh, [EMWaveEdge("real", omega=1.0, dim=3)],
                       {"mu_m": 1.0, "eps": 1.0, "J_im": source})
        for ns in ("left", "right", "top", "bottom", "front", "back"):
            prob.add_dirichlet(ns, EDGE_RE, 0, 0.0)
        prob.finalize()
        res = NewtonSolver(prob, NewtonOptions(
            max_iter=3, tol_residual=1e-11, linear_solver="direct")).solve(
            np.zeros(prob.dofmap.n_dof), prob.base_params())
        assert res.converged and res.iters <= 2

        def Efun(p):
            Ez = np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
            return np.stack([0 * Ez, 0 * Ez, Ez], axis=1)

        got = prob.get_nodal_field(res.x, EDGE_RE, 0)
        exact = _exact_circulations(mesh, Efun, "hex")
        mids = np.array(sorted(exact))
        e = np.array([exact[m] for m in mids])
        return np.linalg.norm(got[mids] - e) / np.linalg.norm(e)

    e4 = run(4)
    e8 = run(8)
    assert e8 < 0.06, e8
    assert e4 / e8 > 1.7, (e4, e8)
