"""BC conflict-resolution priority semantics (src/mm_bc_conflict.c parity):

1. duplicate Dirichlet specs at the same dof: first-in-deck wins, with a
   warning on conflicting values (mm_bc_conflict.c:832 "defaulting to 1st
   occurence");
2. DIRICHLET precedence: a Dirichlet swamps a collocated point constraint
   on the same row (mm_bc_conflict.c:806);
3. a rotated constraint displaced by a Dirichlet shifts to the next
   coordinate direction's row and both are enforced
   (mm_bc_conflict.c:866 "move this condition to the next coordinate
   direction, if available").
"""

import warnings

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_dirichlet_first_wins_with_warning():
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)], {})
    prob.add_dirichlet("top", "temperature", 0, 2.0)
    prob.add_dirichlet("left", "temperature", 0, 5.0)  # conflicts at corner
    with pytest.warns(UserWarning, match="first spec takes precedence"):
        prob.finalize()
    dm = prob.dofmap
    corner = np.intersect1d(mesh.nodesets["top"], mesh.nodesets["left"])[0]
    d = dm.dof_of_node_svar[corner, dm.svar("temperature", 0)]
    i = np.where(prob.dirichlet_dofs == d)[0]
    assert i.size == 1 and prob.dirichlet_vals[i[0]] == 2.0


def test_dirichlet_swamps_point_constraint():
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)], {})
    prob.add_dirichlet("bottom", "temperature", 0, 1.0)
    # collocated constraint on the same rows: must be discarded
    prob.add_point_constraint("bottom", "temperature", 0,
                              lambda q, c, params: q[0] - 99.0)
    prob.add_dirichlet("top", "temperature", 0, 0.0)
    prob.finalize()
    assert not prob._point_sets  # all rows swamped by the Dirichlet
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    np.testing.assert_allclose(T[mesh.nodesets["bottom"]], 1.0, atol=1e-10)


def test_rotated_constraint_displaced_by_dirichlet():
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": 1.0})
    # Dirichlet on u_x over the whole top: occupies the row the rotated
    # normal constraint would claim (direction 0)
    prob.add_dirichlet("top", "velocity", 0, 3.0)
    prob.add_rotation(("top",), "velocity")
    prob.add_rotated_dirichlet(("top",), "velocity", "normal", 0.0)
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    with pytest.warns(UserWarning, match="moved"):
        prob.finalize()
    rot = prob._rotation
    dm = prob.dofmap
    top = [n for n in mesh.nodesets["top"]
           if n not in mesh.nodesets["left"] and n not in mesh.nodesets["right"]]
    rows_u1 = set(int(dm.dof_of_node_svar[n, dm.svar("velocity", 1)]) for n in top)
    # every surviving constraint row is a u_y row (displaced from u_x)
    assert set(int(r) for r in rot.con_rows) <= rows_u1
    # constraint still enforces n.u = 0 (normal coefficients, not tangent)
    res = NewtonSolver(prob, NewtonOptions(max_iter=8, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    uy = prob.get_nodal_field(res.x, "velocity", 1)
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    np.testing.assert_allclose(uy[np.array(top)], 0.0, atol=1e-9)  # n.u = u_y
    np.testing.assert_allclose(ux[np.array(top)], 3.0, atol=1e-9)  # Dirichlet


def test_rotated_constraint_dropped_when_all_rows_dirichlet():
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1")],
                   {"rho": 1.0, "mu": 1.0})
    for ns in ("top", "left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_rotation(("top",), "velocity")
    prob.add_rotated_dirichlet(("top",), "velocity", "normal", 7.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    with pytest.warns(UserWarning, match="dropped"):
        prob.finalize()
    assert prob._rotation.con_rows.size == 0


def test_point_constraint_first_strong_claim_wins():
    """Two collocated constraints claiming the same row: the FIRST spec is
    kept, the later one discarded (mm_bc_conflict.c:1000), and the
    resolution lands in bc_dup_log / bc_dup_report."""
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)], {})
    prob.add_dirichlet("top", "temperature", 0, 0.0)
    # first claim: T = 1 on the bottom rows; second claim (shares the
    # corner nodes with "left") must lose at the shared nodes
    prob.add_point_constraint("bottom", "temperature", 0,
                              lambda q, c, params: q[0] - 1.0)
    prob.add_point_constraint("left", "temperature", 0,
                              lambda q, c, params: q[0] - 2.0)
    with pytest.warns(UserWarning, match="first strong claim wins"):
        prob.finalize()
    corner = np.intersect1d(mesh.nodesets["bottom"], mesh.nodesets["left"])
    assert corner.size == 1
    dm = prob.dofmap
    crow = int(dm.dof_of_node_svar[corner[0], dm.svar("temperature", 0)])
    # the corner row belongs to the FIRST (bottom) set only
    rows0 = set(int(r) for r in prob._point_sets[0].rows)
    rows1 = set(int(r) for r in prob._point_sets[1].rows)
    assert crow in rows0 and crow not in rows1
    assert any(e["row"] == crow for e in prob.bc_dup_log)
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, linear_solver="direct")
                       ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    np.testing.assert_allclose(T[corner[0]], 1.0, atol=1e-10)  # first spec


def test_bc_dup_report_lists_resolutions():
    mesh = rectangle_mesh(4, 4, elem="QUAD4")
    prob = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)], {})
    prob.add_dirichlet("top", "temperature", 0, 2.0)
    prob.add_dirichlet("left", "temperature", 0, 5.0)
    prob.add_point_constraint("top", "temperature", 0,
                              lambda q, c, params: q[0] - 9.0)
    with pytest.warns(UserWarning):
        prob.finalize()
    rep = prob.bc_dup_report()
    assert "DIRICHLET precedence" in rep
    assert "first occurrence kept" in rep
    # clean problem reports no duplicates
    p2 = Problem(mesh, [Energy(interp="Q1", transient=False, convection=False)], {})
    p2.add_dirichlet("top", "temperature", 0, 1.0)
    p2.finalize()
    assert "no duplicate" in p2.bc_dup_report()
