"""Quadrature rules (host-side numpy tables, consumed as constants by kernels).

Parity: reference element-type database & Gauss rules live in
``src/el_elm_info.c`` (``elem_info``, ``find_stu:1615``, ``find_surf_st:1987``).
Here rules are generated: tensor-product Gauss-Legendre for quad/hex/bar and
standard symmetric rules for simplices (textbook tables, e.g. Dunavant/Keast).

All tables are float64 numpy; they become compile-time constants inside jitted
kernels, so precision here costs nothing at runtime.
"""

from __future__ import annotations

import numpy as np


def gauss_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_tensor(n: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Tensor-product Gauss rule on [-1,1]^dim. Returns (pts (nq, dim), wts (nq,))."""
    x1, w1 = gauss_1d(n)
    grids = np.meshgrid(*([x1] * dim), indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=-1)
    wg = np.meshgrid(*([w1] * dim), indexing="ij")
    wts = np.ones(pts.shape[0])
    for w in wg:
        wts = wts * w.ravel()
    return pts, wts


# --- simplex rules: points in barycentric-free reference coords ---
# triangle reference: {(r,s): r>=0, s>=0, r+s<=1}, area 1/2
_TRI_RULES: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _init_tri_rules():
    # degree 1: centroid
    _TRI_RULES[1] = (np.array([[1 / 3, 1 / 3]]), np.array([0.5]))
    # degree 2: 3-point
    a = 1 / 6
    _TRI_RULES[2] = (
        np.array([[a, a], [2 / 3, a], [a, 2 / 3]]),
        np.full(3, 1 / 6),
    )
    # degree 4: 6-point (Dunavant)
    a1, w1 = 0.445948490915965, 0.223381589678011
    a2, w2 = 0.091576213509771, 0.109951743655322
    pts = []
    wts = []
    for a, w in ((a1, w1), (a2, w2)):
        pts += [[a, a], [1 - 2 * a, a], [a, 1 - 2 * a]]
        wts += [w / 2] * 3  # scale: Dunavant weights sum to 1 on unit-area tri
    _TRI_RULES[4] = (np.array(pts), np.array(wts))
    # degree 5: 7-point
    pts = [[1 / 3, 1 / 3]]
    wts = [0.225 / 2]
    a1, w1 = 0.470142064105115, 0.132394152788506
    a2, w2 = 0.101286507323456, 0.125939180544827
    for a, w in ((a1, w1), (a2, w2)):
        pts += [[a, a], [1 - 2 * a, a], [a, 1 - 2 * a]]
        wts += [w / 2] * 3
    _TRI_RULES[5] = (np.array(pts), np.array(wts))


_init_tri_rules()

# tetrahedron reference: {(r,s,t)>=0, r+s+t<=1}, volume 1/6
_TET_RULES: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _init_tet_rules():
    _TET_RULES[1] = (np.array([[0.25, 0.25, 0.25]]), np.array([1 / 6]))
    # degree 2: 4-point
    a = (5 - np.sqrt(5)) / 20
    b = (5 + 3 * np.sqrt(5)) / 20
    pts = np.array([[a, a, a], [b, a, a], [a, b, a], [a, a, b]])
    _TET_RULES[2] = (pts, np.full(4, 1 / 24))
    # degree 3: 5-point (Keast)
    pts = [[0.25, 0.25, 0.25]]
    wts = [-4 / 30]
    a, b = 1 / 6, 0.5
    pts += [[a, a, a], [b, a, a], [a, b, a], [a, a, b]]
    wts += [9 / 120] * 4
    _TET_RULES[3] = (np.array(pts), np.array(wts))

    # orbit helpers (barycentric -> (r,s,t) with l1 = 1-r-s-t); weights
    # below are already scaled to the reference volume 1/6
    import itertools

    def orbit(*lams):
        return sorted(set(itertools.permutations(lams)))

    def to_rst(bary):
        return [[l[1], l[2], l[3]] for l in bary]

    # degree 5: 14-point Keast (all-positive weights) — needed for P2
    # (TET10) mass/convection terms: the degree-3 5-point rule leaves the
    # quadratic element mass INDEFINITE (min eig -1.2e-3), which made
    # every transient TET10 system singular
    pts, wts = [], []
    for a, w, npts in ((0.09273525031089123, 0.012248840519393658, 4),
                       (0.3108859192633005, 0.018781320953002642, 4)):
        b = 1.0 - 3.0 * a
        o = orbit(a, a, a, b)
        assert len(o) == npts
        pts += to_rst(o)
        wts += [w] * npts
    a = 0.04550370412564964
    b = 0.5 - a
    o = orbit(a, a, b, b)
    assert len(o) == 6
    pts += to_rst(o)
    wts += [0.007091003462846911] * 6
    _TET_RULES[5] = (np.array(pts), np.array(wts))

    # degree 6: 24-point Keast (all-positive)
    pts, wts = [], []
    for a, w in ((0.21460287125915202, 0.006653791709694660),
                 (0.04067395853461135, 0.0016795351758867738),
                 (0.32233789014227551, 0.009226196923942399)):
        b = 1.0 - 3.0 * a
        o = orbit(a, a, a, b)
        assert len(o) == 4
        pts += to_rst(o)
        wts += [w] * 4
    a, b = 0.06366100187501753, 0.6030056647916492
    c = 1.0 - 2.0 * a - b
    o = orbit(a, a, b, c)
    assert len(o) == 12
    pts += to_rst(o)
    wts += [0.008035714285714283] * 12
    _TET_RULES[6] = (np.array(pts), np.array(wts))


_init_tet_rules()


def tri_rule(degree: int) -> tuple[np.ndarray, np.ndarray]:
    for d in sorted(_TRI_RULES):
        if d >= degree:
            return _TRI_RULES[d]
    return _TRI_RULES[max(_TRI_RULES)]


def tet_rule(degree: int) -> tuple[np.ndarray, np.ndarray]:
    for d in sorted(_TET_RULES):
        if d >= degree:
            return _TET_RULES[d]
    return _TET_RULES[max(_TET_RULES)]
