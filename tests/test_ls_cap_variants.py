"""LS capillary-variant kernels: LS_CAP_DIV_N / LS_CAP_DIV_S_N (solved-normal
point-force CSF), LS_CAP_HYSING (semi-implicit interface viscosity), and
LS_CAP_DENNER_DIFF (diffusion-only companion). All must reproduce the static
2D bubble Laplace jump sigma/R; the Hysing/Denner dt terms must vanish on the
static state and not pollute it. Reference:
src/mm_fill_ls_capillary_bcs.c:355,554,736,906."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.physics.level_set import (FILL_VAR, CSFDennerDiffusion, CSFDivN,
                                        CSFHysing, CSFSurfaceTension,
                                        FillEquation, SolvedNormal)
from goma_tpu.solvers import NewtonOptions, NewtonSolver

SIGMA, R, EPS = 1.0, 0.5, 0.25


def _bubble(extra_eqs, need_normal=False):
    mesh = rectangle_mesh(12, 12, elem="QUAD9", xlim=(-1, 1), ylim=(-1, 1))
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [Momentum(dim=2, interp="Q2", transient=False, convection=False),
           Continuity(interp="Q1"),
           FillEquation(interp="Q2", supg=0.0, transient=False)]
    if need_normal:
        eqs.append(SolvedNormal(dim=2, interp="Q1"))
    eqs += extra_eqs
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0,
                       lambda X: R - np.linalg.norm(X, axis=1))
    for nsn in ("left", "right", "top", "bottom"):
        for comp in range(2):
            prob.add_dirichlet(nsn, "velocity", comp, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    return mesh, prob


def _solve(prob, dt=0.0, mesh=None):
    params = prob.base_params(ls_eps=jnp.asarray(EPS, dtype=prob.dtype))
    if dt:
        params = dict(params)
        params["dt"] = jnp.asarray(dt, dtype=prob.dtype)
    x0 = np.zeros(prob.dofmap.n_dof)
    # seed the fill field (and implied normal direction) so the SolvedNormal
    # linearization is regular at the first iterate (grad F != 0)
    if mesh is not None:
        F0 = R - np.linalg.norm(mesh.coords, axis=1)
        x0 = prob.set_nodal_field(x0, FILL_VAR, 0, F0)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=8, linear_solver="direct", tol_residual=1e-8)).solve(
        x0, params)
    assert res.converged
    return res


def _jump(mesh, prob, x):
    p = prob.get_nodal_field(x, "pressure")
    rr = np.where(np.isfinite(p), np.linalg.norm(mesh.coords, axis=1), np.inf)
    rc = np.where(np.isfinite(p), np.linalg.norm(
        mesh.coords - np.array([-1.0, -1.0]), axis=1), np.inf)
    return p[int(np.argmin(rr))] - p[int(np.argmin(rc))]


def _spurious(prob, x):
    u = prob.get_nodal_field(x, "velocity", 0)
    v = prob.get_nodal_field(x, "velocity", 1)
    return float(np.nanmax(np.hypot(np.nan_to_num(u), np.nan_to_num(v))))


def test_csf_div_n_static_bubble():
    mesh, prob = _bubble([CSFDivN(dim=2, sigma=SIGMA)], need_normal=True)
    res = _solve(prob, mesh=mesh)
    jump = _jump(mesh, prob, res.x)
    assert abs(jump - SIGMA / R) < 0.12 * SIGMA / R, jump


def test_csf_div_s_n_static_bubble():
    """div_s n = div n - n.(grad n).n: identical to div n for the radial
    circle normal (n.(grad n).n = 0) — same Laplace jump."""
    mesh, prob = _bubble([CSFDivN(dim=2, sigma=SIGMA, surface_div=True)],
                         need_normal=True)
    res = _solve(prob, mesh=mesh)
    jump = _jump(mesh, prob, res.x)
    assert abs(jump - SIGMA / R) < 0.12 * SIGMA / R, jump


def test_csf_hysing_static_bubble_and_damping():
    """CSFHysing includes the CSF source: static jump preserved with the
    dt interface-viscosity active, and the parasitic-current magnitude must
    not exceed the plain-CSF one (the term only dissipates)."""
    mesh0, prob0 = _bubble([CSFSurfaceTension(dim=2, sigma=SIGMA)])
    r0 = _solve(prob0)
    base_jump = _jump(mesh0, prob0, r0.x)
    base_spur = _spurious(prob0, r0.x)

    mesh, prob = _bubble([CSFHysing(dim=2, sigma=SIGMA, scale=1.0)])
    res = _solve(prob, dt=0.05, mesh=mesh)
    jump = _jump(mesh, prob, res.x)
    assert abs(jump - SIGMA / R) < 0.12 * SIGMA / R, jump
    assert abs(jump - base_jump) < 0.02 * SIGMA / R
    assert _spurious(prob, res.x) <= base_spur * (1.0 + 1e-8)


def test_csf_denner_companion():
    """CSFSurfaceTension + CSFDennerDiffusion (the reference's
    LS_CAPILLARY + LS_CAP_DENNER_DIFF pairing): jump unchanged, currents
    not amplified."""
    mesh, prob = _bubble([CSFSurfaceTension(dim=2, sigma=SIGMA),
                          CSFDennerDiffusion(dim=2, sigma=SIGMA, scale=2.0)])
    res = _solve(prob, dt=0.05, mesh=mesh)
    jump = _jump(mesh, prob, res.x)
    assert abs(jump - SIGMA / R) < 0.12 * SIGMA / R, jump


def test_csf_denner_solved_normal_variant():
    """use_solved_normal=True (reference assemble_cap_denner_diffusion_n,
    chosen when the R_NORMAL family is active)."""
    mesh, prob = _bubble(
        [CSFSurfaceTension(dim=2, sigma=SIGMA),
         CSFDennerDiffusion(dim=2, sigma=SIGMA, scale=2.0,
                            use_solved_normal=True)],
        need_normal=True)
    res = _solve(prob, dt=0.05, mesh=mesh)
    jump = _jump(mesh, prob, res.x)
    assert abs(jump - SIGMA / R) < 0.12 * SIGMA / R, jump


def test_ls_latent_heat_total_source():
    """LS_LATENT_HEAT: uniform advection through a flat interface — the
    band integral of delta |grad F| is 1, so the net energy-row source is
    exactly rho L u_n."""
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.physics import Energy
    from goma_tpu.physics.level_set import LSLatentHeat

    rho, Lh, un = 2.0, 5.0, 0.4
    mesh = rectangle_mesh(8, 4, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Energy(interp="Q2", transient=False, convection=False),
           FillEquation(interp="Q2", supg=0.0, transient=False),
           PassiveVar("velocity", 2, "Q2"),
           LSLatentHeat(Lh, interp="Q2")]
    prob = Problem(mesh, eqs, {"rho": rho, "Cp": 1.0, "k": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0, lambda c: c[:, 0] - 0.5)
    prob.add_dirichlet("all", "velocity", 0, un)
    prob.add_dirichlet("all", "velocity", 1, 0.0)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, FILL_VAR, 0, mesh.coords[:, 0] - 0.5)
    x0 = prob.set_nodal_field(x0, "velocity", 0, un)
    params = prob.base_params(ls_eps=jnp.asarray(0.15, dtype=prob.dtype))
    R = np.asarray(prob.residual(jnp.asarray(x0), params))
    dm = prob.dofmap
    dT = dm.dof_of_node_svar[:, dm.svar("temperature", 0)]
    tot = R[dT[dT >= 0]].sum()
    np.testing.assert_allclose(-tot, rho * Lh * un, rtol=5e-3)
