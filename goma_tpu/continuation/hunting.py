"""Hunting: staged multi-parameter sweeps.

Parity: reference ``src/ac_hunt.c:91 hunt_problem`` — march several
parameters together from start to end values with a shared adaptive step,
re-converging at each stage. Built on ``continue_problem`` with a single
normalized sweep coordinate s in [0, 1] mapped onto every hunted parameter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from goma_tpu.continuation.conti import ContinuationStep, continue_problem
from goma_tpu.solvers.newton import NewtonOptions


@dataclass
class HuntSpec:
    key: str  # params leaf
    start: float
    end: float
    log: bool = False  # geometric path (reference: logarithmic hunting)

    def value(self, s):
        if self.log:
            return self.start * (self.end / self.start) ** s
        return self.start + (self.end - self.start) * s


def hunt_problem(
    problem,
    specs: list[HuntSpec],
    x0,
    ds0: float = 0.25,
    newton_options: NewtonOptions | None = None,
    base_params: dict | None = None,
    **kw,
) -> list[ContinuationStep]:
    """Sweep all hunted parameters from their start to end values."""

    def make_params(s):
        p = problem.base_params() if base_params is None else dict(base_params)
        for spec in specs:
            p[spec.key] = jnp.asarray(spec.value(s), dtype=problem.dtype)
        return p

    return continue_problem(
        problem, make_params, 0.0, 1.0, ds0, x0, newton_options, **kw
    )


def detect_folds(arc_steps) -> list[int]:
    """Indices where the continuation parameter reverses along an arclength
    branch (turning points). Reference: LOCA turning-point detection."""
    lams = np.array([s.lam for s in arc_steps])
    d = np.diff(lams)
    out = []
    for i in range(1, len(d)):
        if d[i - 1] * d[i] < 0:
            out.append(i)
    return out
