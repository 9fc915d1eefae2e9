"""Axisymmetric pipe/die flow with thermal coupling and optional swirl —
the BASELINE-style axisymmetric deck (the class of coating/extrusion
problems Goma's CYLINDRICAL/SWIRLING coordinates exist for; reference
load_coordinate_scales src/mm_fill_aux.c:127).

Geometry: pipe (z, r) in [0, L] x [0, R]. Pressure-driven flow (body force
G e_z), heated wall, rotating wall section (swirl w = Omega R). Checks:
Poiseuille centerline velocity, wall heat-flux balance, swirl profile.

Run:  python examples/axisym_die_swirl.py [nz] [nr]
"""

import sys

import numpy as np


def run(nz=12, nr=10, Re=10.0, Omega=0.5, exo_out=None, linear_solver="direct"):
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Energy, Momentum, SwirlMomentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    L, R = 2.0, 1.0
    G, mu, rho = 4.0, 1.0 / Re, 1.0
    mesh = rectangle_mesh(nz, nr, elem="QUAD9", xlim=(0, L), ylim=(0, R))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, interp="Q2", transient=False),
         SwirlMomentum(interp="Q2", transient=False),
         Continuity(interp="Q1"),
         Energy(interp="Q2", transient=False)],
        {"rho": rho, "mu": mu, "k": 1.0, "Cp": 1.0, "body_force": (G, 0.0)},
        coord="swirling",
    )
    # wall r = R: no slip, rotating (swirl), hot
    prob.add_dirichlet("top", "velocity", 0, 0.0)
    prob.add_dirichlet("top", "swirl", 0, Omega * R)
    prob.add_dirichlet("top", "temperature", 0, 1.0)
    # axis r = 0: symmetry (u_r = 0, w = 0; natural for u_z, T)
    prob.add_dirichlet("bottom", "velocity", 1, 0.0)
    prob.add_dirichlet("bottom", "swirl", 0, 0.0)
    # inlet/outlet: u_r = 0, natural u_z (fully developed); inlet cold
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("top", "velocity", 1, 0.0)
    prob.add_dirichlet("left", "temperature", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    res = NewtonSolver(
        prob,
        NewtonOptions(max_iter=12, tol_residual=1e-9,
                      linear_solver=linear_solver, linear_tol=1e-10,
                      gmres_restart=120, linear_maxiter=2000),
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    # checks
    uz_axis_exact = G * R**2 / (4.0 * mu)
    uz = prob.get_nodal_field(res.x, "velocity", 0)
    axis = np.abs(mesh.coords[:, 1]) < 1e-12
    uz_axis = np.nanmax(uz[axis])
    if exo_out:
        from goma_tpu.io import write_exodus

        write_exodus(exo_out, mesh, nodal_vars={
            "uz": np.nan_to_num(uz),
            "ur": np.nan_to_num(prob.get_nodal_field(res.x, "velocity", 1)),
            "w": np.nan_to_num(prob.get_nodal_field(res.x, "swirl")),
            "T": np.nan_to_num(prob.get_nodal_field(res.x, "temperature")),
            "p": np.nan_to_num(prob.get_nodal_field(res.x, "pressure")),
        })
    return prob, res, dict(uz_axis=uz_axis, uz_axis_exact=uz_axis_exact)


if __name__ == "__main__":
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    prob, res, chk = run(nz, nr, exo_out="axisym_die_swirl.exo")
    print(res.summary())
    print(f"centerline u_z = {chk['uz_axis']:.6f} "
          f"(Poiseuille exact {chk['uz_axis_exact']:.6f})")
