"""Linear stability analysis (LSA): generalized eigensolve at a steady state.

Parity: reference ``src/ac_stability.c:88 solve_stability_problem`` — assemble
Jacobian J and mass matrix M, solve J z = mu M z by shift-invert (the
"eggroll" Arnoldi solver ``src/sl_eggrollwrap.c:69`` / ARPACK Cayley
``src/loca_eigen_cayley.F``).

The mass matrix needs no separate assembly code: the time scheme enters the
residual as qdot = ct*x + hist, linear in ct, so

    M = dR/d(qdot) = A(ct=1) - A(ct=0)

with A the assembled Jacobian values — two assemblies, zero new kernels.
(Dirichlet rows are identity in both, so their M rows vanish, exactly the
reference's "no mass on BC rows".)

Perturbations x0 + z e^{sigma t} satisfy (J + sigma M) z = 0; we report
growth rates sigma = -mu for eigenvalues mu of J z = mu M z nearest the
shift (stable iff all Re(sigma) < 0). Host shift-invert Arnoldi via
scipy.sparse (serial validation path, like the reference's eggroll).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass
class StabilityResult:
    growth_rates: np.ndarray  # complex, sorted by descending real part
    modes: np.ndarray  # (n_dof, k)
    stable: bool


def mass_and_jacobian(problem, x, params):
    """Returns (J_vals, M_vals) CSR value arrays at state x."""
    p0 = dict(params)
    p0["ct"] = jnp.zeros((), dtype=problem.dtype)
    _, J = problem.assemble(jnp.asarray(x), p0)
    p1 = dict(params)
    p1["ct"] = jnp.ones((), dtype=problem.dtype)
    _, A1 = problem.assemble(jnp.asarray(x), p1)
    return np.asarray(J), np.asarray(A1) - np.asarray(J)


def solve_stability(problem, x, params, n_modes: int = 6, shift: float = 0.0) -> StabilityResult:
    """Leading eigenmodes of the linearized dynamics at steady state x."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    Jv, Mv = mass_and_jacobian(problem, x, params)
    pat = problem.pattern
    J = sp.csr_matrix((Jv, pat.indices, pat.indptr), shape=(pat.n, pat.n))
    M = sp.csr_matrix((Mv, pat.indices, pat.indptr), shape=(pat.n, pat.n))
    # J z = mu M z, shift-invert near mu = -shift (growth sigma = -mu near shift)
    mu, z = spla.eigs(J, k=n_modes, M=M, sigma=-shift, which="LM")
    sigma = -mu
    order = np.argsort(-sigma.real)
    sigma = sigma[order]
    z = z[:, order]
    return StabilityResult(growth_rates=sigma, modes=z, stable=bool(np.all(sigma.real < 0)))
