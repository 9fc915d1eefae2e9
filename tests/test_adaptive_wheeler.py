"""Adaptive Wheeler moment inversion (reference adaptive_wheeler,
src/mm_fill_population.c:205): degeneracy-safe node reduction + Wright
log-normal correction for unrealizable sets."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.physics.population import (adaptive_wheeler_n2,
                                         moment_correction_wright)


def _moments_two_delta(w, L):
    return np.array([sum(wi * Li**k for wi, Li in zip(w, L)) for k in range(4)])


def test_adaptive_recovers_two_peaks():
    w_true, L_true = (0.3, 0.7), (1.0, 3.0)
    m = _moments_two_delta(w_true, L_true)
    w, L, n = adaptive_wheeler_n2(jnp.asarray(m))
    assert int(n) == 2
    order = np.argsort(np.asarray(L))
    np.testing.assert_allclose(np.asarray(L)[order], L_true, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(w)[order], w_true, rtol=1e-10)


def test_adaptive_collapses_single_delta():
    """A single-delta moment set (m_k = w L^k) is degenerate for 2 nodes:
    the reference collapses to n=1 with w0=m0, L0=m1/m0."""
    w0, L0 = 2.0, 1.5
    m = np.array([w0 * L0**k for k in range(4)])
    w, L, n = adaptive_wheeler_n2(jnp.asarray(m))
    assert int(n) == 1
    np.testing.assert_allclose(float(w[0]), w0, rtol=1e-8)
    np.testing.assert_allclose(float(L[0]), L0, rtol=1e-8)
    assert float(w[1]) == 0.0


def test_adaptive_zero_moment():
    w, L, n = adaptive_wheeler_n2(jnp.zeros(4))
    assert int(n) == 1
    assert float(w[0]) == 0.0 and float(L[0]) == 0.0


def test_adaptive_unrealizable_wright_correction():
    """b1 < 0 (unrealizable): Wright-corrected moments are used; the result
    stays finite, weights nonnegative, and matches inverting the corrected
    set directly."""
    m = np.array([1.0, 2.0, 3.0, 30.0])  # m2 < m1^2/m0 -> c2 < 0
    assert m[2] - m[1] ** 2 / m[0] < 0
    w, L, n = adaptive_wheeler_n2(jnp.asarray(m))
    assert np.all(np.isfinite(np.asarray(w))) and np.all(np.isfinite(np.asarray(L)))
    assert np.all(np.asarray(w) >= 0)
    mc = np.asarray(moment_correction_wright(jnp.asarray(m)))
    wc, Lc, nc = adaptive_wheeler_n2(jnp.asarray(mc))
    np.testing.assert_allclose(np.asarray(w), np.asarray(wc), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lc), rtol=1e-10)


def test_adaptive_batched_jit():
    import jax

    m = np.stack([
        _moments_two_delta((0.3, 0.7), (1.0, 3.0)),
        np.array([2.0 * 1.5**k for k in range(4)]),
        np.zeros(4),
    ])
    w, L, n = jax.jit(adaptive_wheeler_n2)(jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(n), [2, 1, 1])
    # moment reconstruction for the realizable rows
    for r in range(2):
        for k in range(4):
            np.testing.assert_allclose(
                float(jnp.sum(w[r] * L[r] ** k)), m[r, k], rtol=1e-8,
                err_msg=f"row {r} moment {k}")


def test_moment_equations_adaptive_closure_runs():
    """MomentEquations(adaptive=True) assembles and matches the plain N=2
    closure on a realizable uniform state."""
    import jax
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import MomentEquations

    m_set = _moments_two_delta((0.3, 0.7), (1.0, 3.0))
    for adaptive in (False, True):
        mesh = rectangle_mesh(3, 3, elem="QUAD4")
        prob = Problem(mesh, [MomentEquations(
            growth=lambda L: 0.5 * jnp.ones_like(L), nucleation_rate=0.1,
            L0=0.5, interp="Q1", transient=False, supg=0.0,
            adaptive=adaptive)], {})
        prob.finalize()
        x = np.zeros(prob.dofmap.n_dof)
        dm = prob.dofmap
        for k in range(4):
            d = dm.dof_of_node_svar[:, dm.svar("moments", k)]
            x[d[d >= 0]] = m_set[k]
        R, _ = prob._assemble(jnp.asarray(x, dtype=prob.dtype),
                              prob.base_params())
        R = np.asarray(R)
        assert np.all(np.isfinite(R))
        if adaptive:
            np.testing.assert_allclose(R, R_plain, atol=1e-12)
        else:
            R_plain = R.copy()
