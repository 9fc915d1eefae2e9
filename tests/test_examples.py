"""Smoke+validation tests for the five BASELINE example decks."""

import numpy as np
import pytest


def test_example_cavity():
    from examples.cavity import run

    prob, res = run(n=10, Re=100.0, linear_solver="direct")
    assert res.converged and res.iters <= 7


def test_example_buoyant_devahldavis():
    from examples.buoyant_convection import run

    _, res, Nu = run(n=12, Ra=1e3, linear_solver="direct")
    assert res.converged
    np.testing.assert_allclose(abs(Nu), 1.118, rtol=0.01)  # de Vahl Davis


def test_example_slot_coater():
    from examples.slot_coater import run

    prob, res, xs, h = run(nx=16, ny=5, t_end=5.0, linear_solver="direct")
    # film draws down from the die gap to q/U
    assert abs(h[-1] - 0.5) < 0.02, h
    assert h[0] == pytest.approx(1.0, abs=1e-9)  # pinned at the lip
    # monotone decrease (small waviness tolerated)
    assert np.all(np.diff(h) < 0.02)
    # mass conservation: outflow plug flux = inflow Couette flux
    from goma_tpu.post import flow_rate, sideset_integral

    q_out = float(sideset_integral(prob, "right", flow_rate)(res.x, prob.base_params()))
    np.testing.assert_allclose(q_out, 0.5, rtol=0.03)


def test_example_viscoelastic_models():
    from examples.viscoelastic_channel import run

    for model in ("oldroyd_b", "giesekus", "logconf"):
        prob, res = run(model, n=5)
        assert res.converged, model


def test_example_two_phase_static():
    from examples.two_phase_bubble import run_static

    _, _, dp = run_static(n=12, linear_solver="direct")
    np.testing.assert_allclose(dp, 2.0, rtol=0.08)  # Laplace sigma/r


def test_example_immersed_cylinder():
    from examples.immersed_cylinder import run

    prob, res, drag = run(nx=16, ny=8, n_seg=24, linear_solver="direct")
    assert res.converged
    # the flow pushes the cylinder downstream: positive drag, O(mu U) scale
    assert drag > 0.5, drag


def test_example_rb_stability_sweep():
    from examples.rayleigh_benard_3d_stability import sweep

    out = dict(sweep(Ra=700.0, betas=(1.2, 2.221, 3.6)))
    assert out[2.221] > 0 and out[1.2] < 0 and out[3.6] < 0
