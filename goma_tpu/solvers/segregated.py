"""Segregated (split-operator) solves.

Parity: reference ``src/rf_solve_segregated.c:185 solve_problem_segregated``
— when the unknowns are split into multiple matrices, each subproblem is
Newton-solved in sequence, iterating to self-consistency (the
Problem_Graph/pg->imtrx machinery, ``include/mm_as_structs.h:921``).

Here each subproblem is its own ``Problem`` on the shared mesh; coupling
fields travel as external nodal fields (fv.ext), and a Picard loop iterates
the sequence until the inter-field updates stall. The projection-method
split (u*, p* of src/mm_fill_split.c) can be expressed in the same frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from goma_tpu.solvers.newton import NewtonOptions, NewtonSolver


@dataclass
class SubProblem:
    name: str
    problem: object  # finalized Problem
    # export(x) -> dict of external-field arrays {name: (n_nodes,)} published
    # to the other subproblems
    export: Callable
    newton_options: NewtonOptions | None = None


@dataclass
class SegregatedResult:
    x: dict  # name -> solution vector
    converged: bool
    outer_iters: int
    history: list


class SegregatedSolver:
    def __init__(self, subproblems: list[SubProblem], max_outer: int = 30,
                 tol: float = 1e-8, relax: float = 1.0):
        self.subs = subproblems
        self.max_outer = max_outer
        self.tol = tol
        self.relax = relax
        self._solvers = {
            s.name: NewtonSolver(s.problem, s.newton_options) for s in subproblems
        }

    def solve(self, x0: dict, params: dict | None = None) -> SegregatedResult:
        xs = {k: np.array(v, copy=True) for k, v in x0.items()}
        shared: dict[str, np.ndarray] = {}
        for s in self.subs:
            shared.update(s.export(xs[s.name]))
        history = []
        converged = False
        it = 0
        for it in range(self.max_outer):
            delta = 0.0
            for s in self.subs:
                prob = s.problem
                extra = {
                    f"ext_{n}": jnp.asarray(shared[n], dtype=prob.dtype)
                    for n in prob.external_fields
                }
                p = prob.base_params(**extra)
                if params:
                    for k, v in params.items():
                        p[k] = v
                res = self._solvers[s.name].solve(xs[s.name], p)
                if not res.converged:
                    history.append((s.name, it, "newton failed"))
                x_new = (1 - self.relax) * xs[s.name] + self.relax * res.x
                delta = max(
                    delta,
                    float(np.max(np.abs(x_new - xs[s.name]))
                          / max(1e-30, float(np.max(np.abs(x_new))))),
                )
                xs[s.name] = x_new
                shared.update(s.export(xs[s.name]))
            history.append(("outer", it, delta))
            if delta < self.tol:
                converged = True
                break
        return SegregatedResult(x=xs, converged=converged, outer_iters=it + 1,
                                history=history)
