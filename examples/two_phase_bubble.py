"""BASELINE config #5: level-set two-phase flow — a static bubble with CSF
surface tension (Laplace law) and an optional rising-bubble transient.

Run: python examples/two_phase_bubble.py [n] [mode]   mode: static|rising
"""

import sys

import numpy as np


def run_static(n=16, sigma=1.0, r0=0.5, eps=0.2, steps_t=0.04,
               linear_solver="gmres"):
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, CSFSurfaceTension, FillEquation, Momentum
    from goma_tpu.solvers import NewtonOptions
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    mesh = rectangle_mesh(n, n, elem="QUAD9", xlim=(-1, 1), ylim=(-1, 1))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=2, transient=True), Continuity(),
         CSFSurfaceTension(dim=2, sigma=sigma),
         FillEquation(interp="Q2", supg=0.0, transient=True)],
        {"rho": 1.0, "mu": 1.0},
    )
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    F0 = np.linalg.norm(mesh.coords, axis=1) - r0
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0, F0)
    ts = TransientSolver(
        prob,
        NewtonOptions(max_iter=8, tol_residual=1e-8, linear_tol=1e-9,
                      linear_maxiter=1500, gmres_restart=80,
                      linear_solver=linear_solver),
        TimeOptions(dt0=0.02, t_end=steps_t, adapt=False),
    )
    res = ts.run(x0, prob.base_params(ls_eps=jnp.asarray(eps)))
    p = prob.get_nodal_field(res.x, "pressure")
    rr = np.linalg.norm(mesh.coords, axis=1)
    dp = np.nanmedian(p[rr < 0.3]) - np.nanmedian(p[rr > 0.8])
    return prob, res, dp


def run_rising(n=16, t_end=0.5, linear_solver="gmres"):
    """Light bubble rising in a heavy fluid (two-phase properties via
    Heaviside blending, gravity body force, periodic renormalization)."""
    import jax.numpy as jnp

    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (
        Continuity, CSFSurfaceTension, FillEquation, LevelSetProperty, Momentum,
        renormalize,
    )
    from goma_tpu.solvers import NewtonOptions
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    mesh = rectangle_mesh(n, 2 * n, elem="QUAD9", xlim=(0, 1), ylim=(0, 2))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)

    rho = LevelSetProperty(minus=10.0, plus=1.0)  # F<0 inside bubble: light? minus=inside
    # convention: F = dist - r0 < 0 inside bubble -> inside gets "minus"
    rho = LevelSetProperty(minus=1.0, plus=10.0)
    mu = LevelSetProperty(minus=0.1, plus=1.0)

    class Gravity:
        def __call__(self, fv, mat, params):
            import jax.numpy as jnp

            r = rho(fv, mat, params)
            # buoyancy: body force per unit mass is -g y; momentum multiplies
            # by rho already, so return constant gravity
            return jnp.stack([jnp.zeros_like(r), -9.8 * jnp.ones_like(r)], axis=1)

    prob = Problem(
        mesh,
        [Momentum(dim=2, transient=True), Continuity(),
         CSFSurfaceTension(dim=2, sigma=0.5),
         FillEquation(interp="Q2", supg=0.5, transient=True)],
        {"rho": rho, "mu": mu, "body_force": Gravity()},
    )
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    c0 = np.array([0.5, 0.5])
    F0 = np.linalg.norm(mesh.coords - c0, axis=1) - 0.25
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0, F0)

    nwin = 4
    centroids = []
    for k in range(nwin):
        ts = TransientSolver(
            prob,
            NewtonOptions(max_iter=10, tol_residual=1e-7, linear_tol=1e-8,
                          linear_maxiter=1500, gmres_restart=80,
                          linear_solver=linear_solver),
            TimeOptions(dt0=0.01, t_end=(k + 1) * t_end / nwin, adapt=True,
                        eps_time=0.3, rel_tol=3e-2, max_dt=0.05),
        )
        res = ts.run(x, prob.base_params(ls_eps=jnp.asarray(0.1)), t0=k * t_end / nwin)
        x = res.x
        F = prob.get_nodal_field(x, "fill")
        x = prob.set_nodal_field(x, "fill", 0, renormalize(mesh, F))
        from goma_tpu.physics.level_set import interface_facets

        segs = interface_facets(mesh, prob.get_nodal_field(x, "fill"))
        centroids.append(segs.mean(axis=(0, 1)))
    return prob, x, np.asarray(centroids)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mode = sys.argv[2] if len(sys.argv) > 2 else "static"
    if mode == "static":
        prob, res, dp = run_static(n)
        print(f"Laplace pressure jump: {dp:.4f} (exact sigma/r = {1.0/0.5:.4f})")
    else:
        prob, x, cents = run_rising(n)
        print("bubble centroid trajectory (x, y):")
        for c in cents:
            print(f"  {c[0]:.4f}  {c[1]:.4f}")
        assert cents[-1][1] > cents[0][1], "bubble should rise"
