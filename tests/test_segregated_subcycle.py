"""Per-matrix time subcycling in the segregated driver
(pg->matrix_subcycle_count / delta_t_fraction / sub_step_solutions,
src/rf_solve_segregated.c:465-510,1495)."""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy, Species
from goma_tpu.solvers.newton import NewtonOptions
from goma_tpu.solvers.segregated import (SegregatedTransientSolver, SubProblem)
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def _heat_problem():
    mesh = rectangle_mesh(6, 6, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=True, convection=False)],
                   {"rho": 1.0, "Cp": 1.0, "k": 1.0})
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    return mesh, prob


def test_subcycled_matches_fine_dt_trajectory():
    """One sub-problem with subcycle_count=4 at dt reproduces exactly the
    backward-Euler trajectory at dt/4 (the sub-step history contract)."""
    mesh, prob = _heat_problem()
    x0 = prob.set_nodal_field(
        np.zeros(prob.dofmap.n_dof), "temperature", 0,
        lambda c: np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))
    nopt = NewtonOptions(max_iter=6, tol_residual=1e-12, linear_solver="direct")

    seg = SegregatedTransientSolver(
        [SubProblem("T", prob, lambda x: {}, newton_options=nopt,
                    subcycle_count=4)],
        dt=0.02, t_end=0.06, theta=0.0)
    r = seg.run({"T": x0})
    assert r.steps == 3

    ref = TransientSolver(prob, nopt,
                          TimeOptions(dt0=0.005, max_dt=0.005, t_end=0.06,
                                      theta=0.0, max_steps=20, adapt=False))
    rr = ref.run(x0, prob.base_params())
    np.testing.assert_allclose(r.x["T"], rr.x, atol=1e-9)
    np.testing.assert_allclose(r.xdot["T"], rr.xdot, atol=1e-7)


def test_coupled_subcycle_stiff_species():
    """T (slow) + S (stiff reaction, subcycled) stay accurate at the big
    dt: the subcycled run tracks the fine-dt monolithic-in-time reference
    much better than the unsubcycled one."""
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    lam = 40.0  # stiff linear decay -lam*S + source T

    def run(sub_k, dt=0.05):
        probT = Problem(
            mesh, [Energy(interp="Q1", transient=True, convection=False)],
            {"rho": 1.0, "Cp": 1.0, "k": 1.0})
        for ns in ("left", "right", "top", "bottom"):
            probT.add_dirichlet(ns, "temperature", 0, 0.0)
        probT.finalize()

        probS = Problem(
            mesh,
            [Species(1, interp="Q1", transient=True, convection=False)],
            {"diffusivity": 0.01,
             "species_source": lambda fv, mat, params:
                 -lam * fv.val["species"] + fv.ext["T_field"][:, None]},
            external_fields=["T_field"])
        probS.finalize()

        nopt = NewtonOptions(max_iter=8, tol_residual=1e-12,
                             linear_solver="direct")
        x0T = probT.set_nodal_field(
            np.zeros(probT.dofmap.n_dof), "temperature", 0,
            lambda c: np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))
        seg = SegregatedTransientSolver(
            [SubProblem("T", probT,
                        lambda x: {"T_field": probT.get_nodal_field(
                            x, "temperature", 0)},
                        newton_options=nopt),
             SubProblem("S", probS, lambda x: {}, newton_options=nopt,
                        subcycle_count=sub_k)],
            dt=dt, t_end=0.2, theta=0.0)
        r = seg.run({"T": x0T, "S": np.zeros(probS.dofmap.n_dof)})
        return r.x["S"]

    S_coarse = run(1)
    S_sub = run(8)
    S_ref = run(1, dt=0.05 / 8)  # fine-dt reference
    err_sub = np.max(np.abs(S_sub - S_ref))
    err_coarse = np.max(np.abs(S_coarse - S_ref))
    # both runs share the coarse-dt T-coupling error, so the gain is bounded
    # by the S-integration share of the error (measured ~0.59x)
    assert err_sub < 0.75 * err_coarse


def test_subcycle_with_sweeps_raises():
    mesh, prob = _heat_problem()
    with pytest.raises(ValueError, match="not supported"):
        SegregatedTransientSolver(
            [SubProblem("T", prob, lambda x: {}, subcycle_count=2)],
            dt=0.1, t_end=0.2, subcycles=2)
