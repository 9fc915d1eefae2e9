"""LS-gated velocity boundary conditions: VELO_NORMAL_LS (+PETROV/COLLOC)
and VELO_TANGENT_LS — the "fake gas outlet" machinery of
src/mm_ns_bc.c:355 (fvelo_normal_bc) and :845 (fvelo_tangential_ls_bc):
no-penetration / tangential-velocity constraints that switch off in the gas
phase and past the leak angle."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.bc import LSNoPenetration
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.physics.level_set import FILL_VAR, FillEquation
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _cavity_with_ls(F_fn, right_kernel, lid_u=1.0):
    mesh = rectangle_mesh(10, 10, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [Momentum(dim=2, interp="Q2", transient=False),
           Continuity(interp="Q1"),
           FillEquation(interp="Q2", supg=0.0, transient=False)]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0, F_fn)
    for ns in ("left", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    # regularized lid (vanishes at the corners — keeps the penalty wall
    # clean of the lid-corner singularity)
    prob.add_dirichlet("top", "velocity", 0,
                       lambda c: lid_u * 16 * c[:, 0]**2 * (1 - c[:, 0])**2)
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel("right", right_kernel)
    prob.finalize()
    return mesh, prob


def _solve(prob):
    params = prob.base_params(ls_eps=jnp.asarray(0.2, dtype=prob.dtype))
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=10, linear_solver="direct", tol_residual=1e-9)).solve(
        np.zeros(prob.dofmap.n_dof), params)
    assert res.converged
    return res


def _right_vn_max(mesh, prob, x):
    u = prob.get_nodal_field(x, "velocity", 0)
    c = mesh.coords
    m = (np.isclose(c[:, 0], 1.0) & ~np.isnan(u)
         & (c[:, 1] < 1.0 - 1e-9) & (c[:, 1] > 1e-9))  # exclude corners
    return float(np.max(np.abs(u[m])))


def test_velo_normal_ls_liquid_blocks():
    """All-liquid (F=-1): the LS-gated no-penetration behaves like a solid
    wall — normal velocity on the right boundary stays at the penalty
    level."""
    mesh, prob = _cavity_with_ls(
        lambda c: -1.0 + 0 * c[:, 0],
        LSNoPenetration(dim=2, length=0.1, penalty=1e6))
    res = _solve(prob)
    assert _right_vn_max(mesh, prob, res.x) < 1e-4


def test_velo_normal_ls_gas_opens():
    """All-gas (F=+1): penalty factor -> 0, the right boundary becomes a
    free (natural) boundary and the driven cavity expels/entrains fluid
    through it."""
    mesh, prob = _cavity_with_ls(
        lambda c: 1.0 + 0 * c[:, 0],
        LSNoPenetration(dim=2, length=0.1, penalty=1e6))
    res = _solve(prob)
    assert _right_vn_max(mesh, prob, res.x) > 1e-2


def test_velo_normal_ls_leak_angle_gate():
    """Interface crossing the right wall (F = y - 0.5, grad F = y_hat so
    n_wall . n_ls = 0). With leak angle 135 deg (cos_leak ~ +0.71) the gate
    stays closed near the interface; with leak angle 45 deg
    (cos_leak ~ -0.71, dot=0 beyond cos_leak+width) it opens the wall band.
    length=2 puts the whole wall inside the |F'|<1 band so the gate governs
    everywhere."""
    F_fn = lambda c: c[:, 1] - 0.5
    mesh_c, prob_c = _cavity_with_ls(
        F_fn, LSNoPenetration(dim=2, length=2.0, leak_angle_deg=135.0,
                              penalty=1e6))
    res_c = _solve(prob_c)
    closed = _right_vn_max(mesh_c, prob_c, res_c.x)

    mesh_o, prob_o = _cavity_with_ls(
        F_fn, LSNoPenetration(dim=2, length=2.0, leak_angle_deg=45.0,
                              penalty=1e6))
    res_o = _solve(prob_o)
    opened = _right_vn_max(mesh_o, prob_o, res_o.x)
    # the 135-deg gate keeps only the liquid half penalized (partially
    # closed); at 45 deg the gate zeroes the penalty -> free boundary
    assert opened > 10 * closed, (closed, opened)
    assert opened > 1e-2


def test_velo_tangent_ls_couette():
    """VELO_TANGENT_LS in the liquid phase: enforce t.v = U on the top wall
    through the penalty kernel (normal direction by Dirichlet) and recover
    the exact Couette profile u = U y."""
    U = 0.7
    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [Momentum(dim=2, interp="Q2", transient=False, convection=False),
           Continuity(interp="Q1"),
           FillEquation(interp="Q2", supg=0.0, transient=False)]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0, lambda c: -1.0 + 0 * c[:, 0])
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    prob.add_dirichlet("bottom", "velocity", 1, 0.0)
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    # sides carry the exact Couette profile (free sides would need the
    # sigma_xy side traction and change the solution)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, lambda c: U * c[:, 1])
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    # top-wall tangent is (-n_y, n_x) = -x_hat (reference stangent
    # convention): driving +x Couette means vtangent = -U
    prob.add_face_kernel("top", LSNoPenetration(
        dim=2, vnormal=-U, tangential=True, length=0.1, penalty=1e6))
    prob.finalize()
    res = _solve(prob)
    u = prob.get_nodal_field(res.x, "velocity", 0)
    c = mesh.coords
    m = ~np.isnan(u)
    np.testing.assert_allclose(u[m], U * c[m, 1], atol=2e-4)


def test_ls_adc_capture_and_gates():
    """LS_ADC: a droplet hovering just above the wall (aligned interface,
    within capture distance, rate*area*dt >= 1) fires the contact event and
    pulls the wall face nodes to the switch value; far droplets and
    misaligned interfaces never fire (P ~ 0 gates)."""
    from goma_tpu.physics.level_set import apply_ls_adc

    mesh = rectangle_mesh(10, 6, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.6))
    c = mesh.coords
    rng = np.random.default_rng(7)

    # near droplet: circle hovering 0.05 above the bottom wall
    F = 0.2 - np.sqrt((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.25) ** 2)
    F_new, ev = apply_ls_adc(mesh, F, "bottom", capture_angle_deg=25.0,
                             capture_distance=0.1, capture_rate=1e4, dt=0.1,
                             rng=rng)
    assert ev
    # contact: wall nodes under the droplet now carry the uniform switch
    # value with the outer-phase sign (interface touches the wall)
    moved = np.where(F_new != F)[0]
    assert moved.size > 0
    assert np.allclose(c[moved, 1], 0.0)
    # far droplet: capture probability decays as exp(1-(d/dc)^2) ~ 0
    F_far = 0.1 - np.sqrt((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.45) ** 2)
    for _ in range(20):
        _, ev_far = apply_ls_adc(mesh, F_far, "bottom",
                                 capture_angle_deg=25.0,
                                 capture_distance=0.02, capture_rate=10.0,
                                 dt=0.01, rng=rng)
        assert not ev_far
    # misaligned: vertical interface meets the bottom wall edge-on
    F_perp = c[:, 0] - 0.5
    _, ev_perp = apply_ls_adc(mesh, F_perp, "bottom",
                              capture_angle_deg=25.0, capture_distance=0.5,
                              capture_rate=1e4, dt=1.0, rng=rng)
    assert not ev_perp
