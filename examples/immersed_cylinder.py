"""Overset (fictitious-domain) rigid cylinder in a channel.

The immersed boundary does not conform to the background mesh: a BAR circle
block carries P0 Lagrange multipliers that enforce no-slip on the cylinder
surface against the background Stokes flow, with the reaction forces feeding
back into the fluid (reference: overlapping-grid contact, src/bc_contact.c;
multipliers src/mm_augc_util.c create_overlap_acs). The multiplier line
integral gives the drag force directly.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import circle_block, rectangle_mesh
from goma_tpu.physics import Continuity, Momentum, OversetLM, OversetNoSlip
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def run(nx=20, ny=10, radius=0.2, center=(0.8, 0.5), n_seg=28, mu=1.0,
        linear_solver="direct"):
    mesh = rectangle_mesh(nx, ny, elem="QUAD9", xlim=(0, 2.0), ylim=(0, 1.0))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    bi = circle_block(mesh, center, radius, n=n_seg, name="cylinder")
    eqs = [
        [Momentum(dim=2, interp="Q2", transient=False, convection=False),
         Continuity(interp="Q1")],
        [OversetLM(dim=2)],
    ]
    prob = Problem(mesh, eqs, [{"rho": 1.0, "mu": mu}, {}])
    prob.add_dirichlet("left", "velocity", 0, lambda c: 4 * c[:, 1] * (1 - c[:, 1]))
    prob.add_dirichlet("top", "velocity", 0, 0.0)
    prob.add_dirichlet("bottom", "velocity", 0, 0.0)
    for ns in ("left", "top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_overset(bi, 0, OversetNoSlip(dim=2))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=8, tol_residual=1e-9, linear_solver=linear_solver)).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())

    # drag = sum of multiplier tractions x segment lengths
    bd = prob.dofmap.blocks[bi]
    s = bd.slot("lm")
    lam = res.x[bd.gather[:, s.start:s.start + s.size]]  # (n_seg, 2)
    seg_len = 2 * np.pi * radius / n_seg
    drag = float(lam[:, 0].sum() * seg_len)
    return prob, res, drag


if __name__ == "__main__":
    prob, res, drag = run()
    print(f"converged={res.converged} drag={drag:.4f}")
