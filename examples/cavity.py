"""BASELINE config #1: 2D steady lid-driven cavity (Navier-Stokes, Q2/Q1).

Run:  python examples/cavity.py [n] [Re]
Writes cavity.exo (open in paraview) and prints the Newton table plus the
Ghia et al. centerline comparison.
"""

import sys

import numpy as np


def run(n=32, Re=100.0, exo_out=None, linear_solver="gmres"):
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [Momentum(dim=2, transient=False), Continuity()],
                   {"rho": 1.0, "mu": 1.0 / Re})
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("top", "velocity", 0, 1.0)
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    prob.add_dirichlet("left", "velocity", 0, 0.0)
    prob.add_dirichlet("right", "velocity", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    res = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-9, linear_tol=1e-10,
                      precond="twolevel", gmres_restart=40, linear_maxiter=2000,
                      linear_solver=linear_solver),
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    if exo_out:
        from goma_tpu.io import write_exodus
        from goma_tpu.post import stream_function

        psi = stream_function(prob, res.x)
        write_exodus(exo_out, mesh, nodal_vars={
            "ux": np.nan_to_num(prob.get_nodal_field(res.x, "velocity", 0)),
            "uy": np.nan_to_num(prob.get_nodal_field(res.x, "velocity", 1)),
            "p": np.nan_to_num(prob.get_nodal_field(res.x, "pressure")),
            "psi": np.nan_to_num(psi),
        })
    return prob, res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    Re = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    prob, res = run(n, Re, exo_out="cavity.exo")
    print(res.summary())
    mesh = prob.mesh
    mask = np.abs(mesh.coords[:, 0] - 0.5) < 1e-12
    dofs = prob.dofmap.dof_of_node_svar[mask, prob.dofmap.svar("velocity", 0)]
    ys = mesh.coords[mask, 1]
    mid = np.argmin(np.abs(ys - 0.5))
    print(f"u_x(0.5, 0.5) = {res.x[dofs[mid]]:.4f}  (Ghia Re=100: -0.2058)")
