"""CPU study: can tpu_direct (NDLU, restricted-pivot multifrontal) replace the
host direct solver on the two BASELINE decks that currently require it?

#3 slot coater (ALE free surface + penalty kinematic BC)
#5 level-set two-phase bubble (CSF band forcing)

Run: python scripts/exp_ndlu_saddle.py --cpu
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_transient(tag, make):
    t0 = time.perf_counter()
    ts, x0, params = make()
    res = ts.run(x0, params)
    ok = all(s.converged for s in res.steps)
    nit = sum(s.newton_iters for s in res.steps)
    log(f"{tag}: steps={len(res.steps)} newton={nit} all_conv={ok} "
        f"|x|={float(np.linalg.norm(np.asarray(res.x))):.6f} "
        f"({time.perf_counter()-t0:.0f}s)")
    return res


def main():
    import os

    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import importlib

    sc = importlib.import_module("examples.slot_coater")

    # --- #3 slot coater
    for solver_kind, leaf in [("direct", 0), ("tpu_direct", 96),
                              ("tpu_direct", 192)]:
        def make():
            ov = (dict(ndlu_leaf_max=leaf, ndlu_refine=3)
                  if solver_kind == "tpu_direct" else None)
            prob, ts, x0 = sc.build(nx=24, ny=6, t_end=0.04,
                                    linear_solver=solver_kind,
                                    newton_overrides=ov)
            return ts, x0, prob.base_params()

        try:
            run_transient(f"slot[{solver_kind},leaf={leaf}]", make)
        except Exception as e:
            log(f"slot[{solver_kind},leaf={leaf}]: FAILED {type(e).__name__}: {e}")

    # --- #5 two-phase bubble
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (Continuity, CSFSurfaceTension, FillEquation,
                                  Momentum)
    from goma_tpu.solvers import NewtonOptions
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    def make_bubble(kind, leaf):
        def make():
            n, sigma, r0 = 24, 1.0, 0.5
            mesh = rectangle_mesh(n, n, elem="QUAD9", xlim=(-1, 1),
                                  ylim=(-1, 1))
            mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
            prob = Problem(
                mesh,
                [Momentum(dim=2, transient=True), Continuity(),
                 CSFSurfaceTension(dim=2, sigma=sigma),
                 FillEquation(interp="Q2", supg=0.0, transient=True)],
                {"rho": 1.0, "mu": 1.0})
            for ns in ("left", "right", "top", "bottom"):
                prob.add_dirichlet(ns, "velocity", 0, 0.0)
                prob.add_dirichlet(ns, "velocity", 1, 0.0)
            prob.add_dirichlet("pin", "pressure", 0, 0.0)
            prob.finalize()
            prob.jacobian_dtype = jnp.float32
            F0 = np.linalg.norm(mesh.coords, axis=1) - r0
            x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill",
                                      0, F0)
            nopts = NewtonOptions(max_iter=10, tol_residual=1e-8,
                                  linear_solver=kind, ndlu_leaf_max=leaf,
                                  ndlu_refine=3)
            ts = TransientSolver(prob, nopts,
                                 TimeOptions(dt0=0.02, t_end=0.04,
                                             adapt=False))
            return ts, x0, prob.base_params(ls_eps=jnp.asarray(0.2))

        return make

    for kind, leaf in [("direct", 0), ("tpu_direct", 96),
                       ("tpu_direct", 192)]:
        try:
            run_transient(f"bubble[{kind},leaf={leaf}]",
                          make_bubble(kind, leaf))
        except Exception as e:
            log(f"bubble[{kind},leaf={leaf}]: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
