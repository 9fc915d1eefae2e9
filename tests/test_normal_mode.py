"""Normal-mode (3D-of-2D) linear stability.

Parity: reference LSA_3D_OF_2D (src/ac_stability.c wavenumber sweep,
src/ac_stability_util.c do_LSA_mods). Validation:

* scalar diffusion: exact 3D decay rates sigma = -((m^2+n^2) pi^2 + beta^2)
  for z-periodic perturbations of the 2D square;
* Rayleigh-Benard, free-slip boundaries: exact critical Rayleigh number
  Ra_c = 27 pi^4 / 4 = 657.51 at beta_c = pi/sqrt(2) — the classic
  quantitative 3D-of-2D benchmark (the unstable mode is uniform in x and
  periodic in z).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.continuation import solve_stability
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    NormalModeContinuity,
    NormalModeEnergy,
    NormalModeMomentum,
    NormalModeW,
)
from goma_tpu.physics.normal_mode import NM_P, NM_T, NM_U, NM_W


def test_normal_mode_heat_spectrum():
    beta = 1.5
    mesh = rectangle_mesh(8, 8, elem="QUAD9")
    prob = Problem(mesh, [NormalModeEnergy(interp="Q2")],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, NM_T, 0, 0.0)
    prob.finalize()
    params = prob.base_params(beta=jnp.asarray(beta, dtype=prob.dtype))
    res = solve_stability(prob, np.zeros(prob.dofmap.n_dof), params,
                          n_modes=4, shift=-(2 * np.pi**2 + beta**2))
    sig = np.sort(-res.growth_rates.real)
    pi2 = np.pi**2
    exact = np.array([2 * pi2, 5 * pi2, 5 * pi2, 8 * pi2]) + beta**2
    np.testing.assert_allclose(sig, exact, rtol=2e-3)
    assert res.stable


def _rb_growth(Ra, beta, n=6):
    """Leading growth rate of the conduction state at (Ra, beta), Pr = 1,
    free-slip horizontal boundaries, x-uniform-compatible side walls."""
    mesh = rectangle_mesh(3, n, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1))
    eqs = [
        NormalModeMomentum(interp="Q2"),
        NormalModeW(interp="Q2"),
        NormalModeContinuity(interp="Q1"),
        NormalModeEnergy(interp="Q2"),
    ]
    mat = {"rho": 1.0, "mu": 1.0, "k": 1.0, "Cp": 1.0,
           "buoyancy": (0.0, Ra)}
    prob = Problem(mesh, eqs, mat, external_fields=("u0", "v0", "T0"))
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, NM_U, 1, 0.0)  # v_hat = 0 (free slip)
        prob.add_dirichlet(ns, NM_T, 0, 0.0)
    # the critical mode is x-uniform with u_hat = 0: pin u_hat at the side
    # walls so the do-nothing pressure condition doesn't pollute p_hat(y)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, NM_U, 0, 0.0)
    prob.finalize()
    dt = prob.dtype
    params = prob.base_params(
        beta=jnp.asarray(beta, dtype=dt),
        ext_u0=jnp.zeros(mesh.n_nodes, dtype=dt),
        ext_v0=jnp.zeros(mesh.n_nodes, dtype=dt),
        ext_T0=jnp.asarray(1.0 - mesh.coords[:, 1], dtype=dt),
    )
    res = solve_stability(prob, np.zeros(prob.dofmap.n_dof), params,
                          n_modes=3, shift=0.5)
    return float(res.growth_rates.real.max())

def test_rayleigh_benard_critical():
    beta_c = np.pi / np.sqrt(2.0)
    Ra_c = 27 * np.pi**4 / 4  # 657.51
    s_lo = _rb_growth(600.0, beta_c)
    s_hi = _rb_growth(720.0, beta_c)
    assert s_lo < 0 < s_hi, (s_lo, s_hi)
    # secant estimate of the neutral Ra from the two growth rates
    Ra_est = 600.0 - s_lo * (720.0 - 600.0) / (s_hi - s_lo)
    assert abs(Ra_est - Ra_c) / Ra_c < 0.02, Ra_est


def test_3d_of_2d_driver_plane_couette():
    """solve_stability_3d_of_2d driver: plane Couette base flow solved as a
    2D NS problem, then swept in wavenumber — Couette is linearly stable
    for all beta (Romanov), all growth rates negative and decreasing in
    viscous damping with beta."""
    from goma_tpu.continuation import solve_stability_3d_of_2d
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(3, 8, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    base = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")], {"rho": 1.0, "mu": 0.1})
    shear = lambda c: c[:, 1]
    for ns in ("left", "right", "top", "bottom"):
        base.add_dirichlet(ns, "velocity", 0, shear)
        base.add_dirichlet(ns, "velocity", 1, 0.0)
    base.add_dirichlet("pin", "pressure", 0, 0.0)
    base.finalize()
    res = NewtonSolver(base, NewtonOptions(max_iter=8, tol_residual=1e-10,
                                           linear_solver="direct")).solve(
        np.zeros(base.dofmap.n_dof), base.base_params())
    assert res.converged

    out = solve_stability_3d_of_2d(base, res.x, betas=(0.5, 2.0),
                                   mat={"rho": 1.0, "mu": 0.1},
                                   n_modes=3, shift=0.0)
    sig = {b: s for b, s, _ in out}
    assert sig[0.5] < 0 and sig[2.0] < 0  # linearly stable
    assert sig[2.0] < sig[0.5]  # extra beta^2 viscous damping
