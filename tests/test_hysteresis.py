"""Hysteretic TANH_HYST saturation (reference src/mm_fill_porous.c:5773 +
scanning-curve state rf_element_storage.c + reversal criterion
mm_fill_porous.c:11210)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.physics import TanhHystSaturation


def _model(**kw):
    kw.setdefault("s_max", 0.95)
    kw.setdefault("beta_w", 1.2)
    kw.setdefault("alpha_w", 2.0)
    kw.setdefault("s_min", 0.08)
    kw.setdefault("beta_d", 1.0)
    kw.setdefault("alpha_d", 3.0)
    return TanhHystSaturation(**kw)


def test_main_curves_monotone_and_bounded():
    m = _model(draining_initial=True)
    st = m.init_state(1)
    pc = jnp.linspace(0.05, 50.0, 200)
    S = np.asarray(m.saturation_pc(pc, jnp.full(200, st["hyst_curve"][0]),
                                   jnp.full(200, st["hyst_sat_switch"][0]),
                                   jnp.full(200, st["hyst_pc_switch"][0])))
    assert np.all(S <= 1.0) and np.all(S >= 0.0)
    assert np.all(np.diff(S) <= 1e-12)  # S decreases with suction
    # draining main curve starts at s_max (pc -> 0) and tends to s_min
    assert S[0] > 0.9 and S[-1] < 0.2


def test_hysteresis_loop():
    """Drain then rewet: the wetting scan passes through the reversal point
    but differs from the draining curve inside the loop (true hysteresis),
    and both branches agree at the reversal point. s_max = 1 here: the
    reference's wetting-scan anchoring (con_a = 1 + con_b,
    mm_fill_porous.c:5872) is continuous at the reversal exactly when the
    wetting curve resaturates fully."""
    m = _model(draining_initial=True, s_max=1.0)
    st = {k: v.copy() for k, v in m.init_state(1).items()}

    def S_of(pc, state):
        return float(m.saturation_pc(
            jnp.asarray([pc]), jnp.asarray(state["hyst_curve"]),
            jnp.asarray(state["hyst_sat_switch"]),
            jnp.asarray(state["hyst_pc_switch"]))[0])

    # drain: pc ramps 0.1 -> 10 (p = -pc decreasing, pdot < 0: stays drain)
    pcs = np.linspace(0.1, 10.0, 30)
    S_drain = []
    for pc in pcs:
        st = m.update_state(st, np.array([-pc]), np.array([-1.0]))
        S_drain.append(S_of(pc, st))
    assert st["hyst_curve"][0] == 1.0
    S_rev = S_drain[-1]

    # reverse: pdot > 0 switches to a wetting scanning curve anchored at
    # the reversal point
    st = m.update_state(st, np.array([-10.0]), np.array([+1.0]))
    assert st["hyst_curve"][0] == 0.0
    np.testing.assert_allclose(st["hyst_sat_switch"][0], S_rev, atol=1e-12)
    np.testing.assert_allclose(st["hyst_pc_switch"][0], 10.0, atol=1e-12)
    # continuity at the reversal point
    np.testing.assert_allclose(S_of(10.0, st), S_rev, atol=1e-10)

    # rewet along the scanning curve: S increases, and differs from the
    # draining values at the same pc (open loop)
    S_wet = [S_of(pc, st) for pc in pcs[::-1]]
    assert all(np.diff(S_wet) >= -1e-12)
    mid = len(pcs) // 2
    assert abs(S_wet[-1 - mid] - S_drain[mid]) > 1e-3


def test_switch_threshold_blocks_noise():
    m = _model(switch_threshold=0.5)
    st = m.init_state(3)
    st2 = m.update_state(st, np.array([-5.0, -5.0, -5.0]),
                         np.array([0.1, 0.6, 0.1]))  # only node 1 above thr
    assert st2["hyst_curve"][0] == 1.0  # unchanged (draining initial)
    assert st2["hyst_curve"][1] == 0.0  # switched to wetting
    assert st2["hyst_curve"][2] == 1.0


def test_richards_hyst_transient_drain_rewet():
    """FE column: drain (falling boundary pressure) then rewet; the nodal
    saturation trajectory shows a hysteresis loop (S on rewet != S on drain
    at the same pressure), and the Newton/AD path works end to end."""
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import PorousFlow
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(4, 2, elem="QUAD4", xlim=(0, 1), ylim=(0, 0.5))
    # switch_threshold (u_saturation[9]) filters small transient pdot
    # wiggles that would anchor pathological scanning curves at tiny pc
    m = _model(switch_threshold=8.0)
    prob = Problem(mesh, [PorousFlow(model=m, interp="Q1", transient=True)],
                   {"permeability": 1e-2, "mu_liquid": 1.0, "porosity": 0.3},
                   external_fields=list(m.EXT_FIELDS))
    prob.add_dirichlet("left", "porous_pressure", 0,
                       lambda c, params: params["p_bc"] * jnp.ones(c.shape[0]))
    prob.finalize()

    n = prob.dofmap.n_dof
    nn = mesh.coords.shape[0]
    state = m.init_state(nn)
    x = np.full(n, -1.0)
    solver = NewtonSolver(prob, NewtonOptions(max_iter=30, tol_residual=1e-9,
                                              linear_solver="direct"))
    dt = 0.05
    # pc stays above the tanh curves' degenerate region (~alpha/beta)
    p_traj = [-1.0, -1.6, -2.4, -2.8, -2.2, -1.6, -1.2]
    S_seen = {}
    for step, pbc in enumerate(p_traj[1:]):
        params = prob.base_params(
            p_bc=jnp.asarray(pbc),
            **{f"ext_{k}": jnp.asarray(v) for k, v in state.items()})
        params["ct"] = jnp.asarray(1.0 / dt, dtype=prob.dtype)
        params["hist"] = jnp.asarray(-x / dt, dtype=prob.dtype)
        res = solver.solve(x, params)
        assert res.converged, f"step {step}: {res.summary()}"
        xn = np.asarray(res.x)
        pdot = (xn - x) / dt
        state = m.update_state(state, xn, pdot)
        x = xn
        pc0 = max(-x[0], 1e-5)
        S_seen[step] = float(m.saturation_pc(
            jnp.asarray([pc0]), jnp.asarray(state["hyst_curve"][:1]),
            jnp.asarray(state["hyst_sat_switch"][:1]),
            jnp.asarray(state["hyst_pc_switch"][:1]))[0])
    # drained then rewetted: ends on the wetting curve
    assert state["hyst_curve"][0] == 0.0
    # saturation recovered while rewetting
    assert S_seen[len(p_traj) - 2] > S_seen[2]
