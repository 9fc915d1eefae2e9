"""Element library unit tests: partition of unity, quadrature exactness,
interpolation completeness, face parametrization."""

import numpy as np
import pytest

from goma_tpu.elements import (
    element_type,
    eval_basis,
    face_rule,
    faces,
    geom_interp,
    interp_local_nodes,
    volume_rule,
)
from goma_tpu.elements.quadrature import gauss_1d, gauss_tensor, tet_rule, tri_rule
from goma_tpu.mesh.mesh import _ref_nodes

ALL_NODAL = [
    ("quad", "Q1"), ("quad", "Q2"), ("tri", "P1"), ("tri", "P2"),
    ("hex", "Q1"), ("hex", "Q2"), ("tet", "P1"), ("tet", "P2"),
    ("bar", "Q1"), ("bar", "Q2"),
]

RAND_PTS = {
    1: np.random.RandomState(0).uniform(-1, 1, (7, 1)),
    "quad": np.random.RandomState(1).uniform(-1, 1, (7, 2)),
    "hex": np.random.RandomState(2).uniform(-1, 1, (7, 3)),
}
# simplex interior points
_r = np.random.RandomState(3).dirichlet([1, 1, 1], 7)
RAND_PTS["tri"] = _r[:, :2]
_r = np.random.RandomState(4).dirichlet([1, 1, 1, 1], 7)
RAND_PTS["tet"] = _r[:, :3]
RAND_PTS["bar"] = RAND_PTS[1]


@pytest.mark.parametrize("family,interp", ALL_NODAL)
def test_partition_of_unity(family, interp):
    pts = RAND_PTS[family]
    N, dN = eval_basis(family, interp, pts)
    np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("family,interp", ALL_NODAL)
def test_kronecker_at_nodes(family, interp):
    """N_i(x_j) = delta_ij at the interpolation's own nodes."""
    etname = {
        ("quad", "Q1"): "QUAD4", ("quad", "Q2"): "QUAD9",
        ("tri", "P1"): "TRI3", ("tri", "P2"): "TRI6",
        ("hex", "Q1"): "HEX8", ("hex", "Q2"): "HEX27",
        ("tet", "P1"): "TET4", ("tet", "P2"): "TET10",
        ("bar", "Q1"): "BAR2", ("bar", "Q2"): "BAR3",
    }[(family, interp)]
    et = element_type(etname)
    nodes = _ref_nodes(et)
    N, _ = eval_basis(family, interp, nodes)
    np.testing.assert_allclose(N, np.eye(et.n_nodes), atol=1e-13)


@pytest.mark.parametrize("family,interp", ALL_NODAL)
def test_gradient_fd(family, interp):
    pts = RAND_PTS[family] * 0.3
    N, dN = eval_basis(family, interp, pts)
    h = 1e-6
    for d in range(pts.shape[1]):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += h
        pm[:, d] -= h
        Np, _ = eval_basis(family, interp, pp)
        Nm, _ = eval_basis(family, interp, pm)
        np.testing.assert_allclose(dN[:, :, d], (Np - Nm) / (2 * h), atol=1e-8)


def test_gauss_1d_exactness():
    for n in range(1, 6):
        x, w = gauss_1d(n)
        for p in range(2 * n):
            exact = (1 - (-1) ** (p + 1)) / (p + 1)
            np.testing.assert_allclose(np.sum(w * x**p), exact, atol=1e-13)


def test_tri_rule_exactness():
    # integral of r^a s^b over unit triangle = a! b! / (a+b+2)!
    from math import factorial

    for deg in (1, 2, 4, 5):
        pts, wts = tri_rule(deg)
        np.testing.assert_allclose(wts.sum(), 0.5, atol=1e-13)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                exact = factorial(a) * factorial(b) / factorial(a + b + 2)
                got = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
                np.testing.assert_allclose(got, exact, atol=1e-12, err_msg=f"deg{deg} r^{a}s^{b}")


def test_tet_rule_exactness():
    from math import factorial

    for deg in (1, 2, 3):
        pts, wts = tet_rule(deg)
        np.testing.assert_allclose(wts.sum(), 1 / 6, atol=1e-13)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                for c in range(deg + 1 - a - b):
                    exact = (
                        factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)
                    )
                    got = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c)
                    np.testing.assert_allclose(got, exact, atol=1e-12)


@pytest.mark.parametrize("family", ["quad", "tri", "hex", "tet"])
def test_face_maps_on_boundary(family):
    """Face ref maps land on the reference element boundary, and the face
    quadrature integrates the perimeter/surface measure of the ref element."""
    et = {"quad": "QUAD4", "tri": "TRI3", "hex": "HEX8", "tet": "TET4"}[family]
    et = element_type(et)
    fr_pts, fr_wts = face_rule(family, 3)
    total = 0.0
    for face in faces(family):
        epts = face.ref_map(fr_pts)
        # measure from ref_jac
        J = face.ref_jac
        G = J.T @ J
        dA = np.sqrt(np.linalg.det(G)) if G.shape[0] > 1 else np.sqrt(G[0, 0])
        total += np.sum(fr_wts) * dA
        if family in ("quad", "hex"):
            assert np.all(np.max(np.abs(epts), axis=1) > 1 - 1e-12)
        else:
            onb = (
                (np.min(epts, axis=1) < 1e-12)
                | (np.abs(epts.sum(axis=1) - 1) < 1e-12)
            )
            assert np.all(onb)
    exact = {"quad": 8.0, "tri": 2 + np.sqrt(2), "hex": 24.0, "tet": 1.5 + np.sqrt(3) / 2}[family]
    np.testing.assert_allclose(total, exact, rtol=1e-12)


def test_q1_subinterp_nodes():
    assert interp_local_nodes("quad", "Q1") == (0, 1, 2, 3)
    assert interp_local_nodes("hex", "Q1") == tuple(range(8))
