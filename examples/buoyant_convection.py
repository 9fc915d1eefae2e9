"""BASELINE config #2: coupled momentum + energy + species — buoyant
(Boussinesq) natural convection with a passive solute, differentially
heated square cavity.

Run: python examples/buoyant_convection.py [n] [Ra]
Validated against the de Vahl Davis benchmark Nusselt number at Ra=1e3/1e4.
"""

import sys

import numpy as np


def run(n=16, Ra=1e3, Pr=0.71, with_species=True, linear_solver="gmres"):
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Energy, Momentum, Species
    from goma_tpu.physics.materials import BoussinesqBodyForce
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    # nondimensional: u* = alpha/L, rho=1, mu=Pr, k=1, Cp=1, g*beta*dT = Ra*Pr
    mesh = rectangle_mesh(n, n, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    eqs = [
        Momentum(dim=2, transient=False),
        Continuity(),
        Energy(interp="Q2", transient=False),
    ]
    if with_species:
        eqs.append(Species(n_species=1, interp="Q2", transient=False))
    mat = {
        "rho": 1.0, "mu": Pr, "k": 1.0, "Cp": 1.0, "diffusivity": 1.0,
        "body_force": BoussinesqBodyForce([0.0, Ra * Pr], beta=-1.0, T0=0.5),
    }
    prob = Problem(mesh, eqs, mat)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("left", "temperature", 0, 1.0)
    prob.add_dirichlet("right", "temperature", 0, 0.0)
    if with_species:
        prob.add_dirichlet("left", "species", 0, 1.0)
        prob.add_dirichlet("right", "species", 0, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    res = NewtonSolver(
        prob,
        NewtonOptions(max_iter=15, tol_residual=1e-9, linear_tol=1e-10,
                      linear_solver=linear_solver, precond="twolevel",
                      gmres_restart=40, linear_maxiter=2000),
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    # hot-wall Nusselt number Nu = -int dT/dn along x=0
    from goma_tpu.post import heat_flux, sideset_integral

    Nu = float(sideset_integral(prob, "left", heat_flux)(res.x, prob.base_params()))
    return prob, res, Nu


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Ra = float(sys.argv[2]) if len(sys.argv) > 2 else 1e3
    prob, res, Nu = run(n, Ra)
    print(res.summary())
    bench = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519}
    ref = bench.get(Ra, None)
    print(f"hot-wall Nu = {Nu:.4f}" + (f"  (de Vahl Davis: {ref})" if ref else ""))
