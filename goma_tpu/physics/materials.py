"""Material property models.

Parity: the reference's property-model library (``src/mm_viscosity.c`` —
Newtonian/power-law/Carreau/Bingham/WLF, ``src/density.c``,
``src/mm_std_models.c``) with their analytic derivative structs
(``DENSITY_DEPENDENCE_STRUCT`` etc.). Here every property is a plain
function of the field state; derivatives come from AD, so no dependence
structs exist.

A property in a material dict may be a python scalar (constant model) or a
callable ``f(fv, mat, params) -> (nq,)`` evaluated at quadrature points.
"""

from __future__ import annotations

import jax.numpy as jnp


def prop(mat: dict, name: str, fv, params, default=None):
    """Evaluate material property at quadrature points -> (nq,) or scalar."""
    v = mat.get(name, default)
    if v is None:
        raise KeyError(f"material property '{name}' missing")
    if callable(v):
        return v(fv, mat, params)
    return v


def shear_rate(fv, var: str = "velocity"):
    """Scalar shear rate: sqrt(2 D:D), D = (grad u + grad u^T)/2.
    Reference: second invariant in ``src/mm_viscosity.c``."""
    g = fv.grad[var]  # (nq, dim, dim)
    D = 0.5 * (g + jnp.swapaxes(g, 1, 2))
    return jnp.sqrt(2.0 * jnp.sum(D * D, axis=(1, 2)) + 1e-32)


class PowerLawViscosity:
    """mu = m * gamma_dot^(n-1). Reference: POWER_LAW model."""

    def __init__(self, m: float, n: float, gamma_min: float = 1e-8):
        self.m, self.n, self.gamma_min = m, n, gamma_min

    def __call__(self, fv, mat, params):
        gd = jnp.maximum(shear_rate(fv), self.gamma_min)
        return self.m * gd ** (self.n - 1.0)


class CarreauViscosity:
    """mu = mu_inf + (mu0-mu_inf) [1+(lam*gd)^a]^((n-1)/a). Reference: CARREAU."""

    def __init__(self, mu0, mu_inf, lam, n, a=2.0):
        self.mu0, self.mu_inf, self.lam, self.n, self.a = mu0, mu_inf, lam, n, a

    def __call__(self, fv, mat, params):
        gd = shear_rate(fv)
        return self.mu_inf + (self.mu0 - self.mu_inf) * (
            1.0 + (self.lam * gd) ** self.a
        ) ** ((self.n - 1.0) / self.a)


class BinghamViscosity:
    """Regularized Bingham-Carreau-Yasuda (Papanastasiou regularization).
    Reference: BINGHAM model in ``src/mm_viscosity.c``."""

    def __init__(self, mu0, tau_y, F=1.0):
        self.mu0, self.tau_y, self.F = mu0, tau_y, F

    def __call__(self, fv, mat, params):
        gd = shear_rate(fv)
        return self.mu0 + self.tau_y * (1.0 - jnp.exp(-self.F * gd)) / jnp.maximum(gd, 1e-12)


class BoussinesqBodyForce:
    """f = g * (1 - beta (T - T0)); multiplied by rho in the momentum kernel.
    Reference: BOUSSINESQ in ``momentum_source_term`` (src/mm_fill_momentum.c)."""

    def __init__(self, gravity, beta: float, T0: float = 0.0, tvar: str = "temperature"):
        self.gravity = jnp.asarray(gravity)
        self.beta, self.T0, self.tvar = beta, T0, tvar

    def __call__(self, fv, mat, params):
        T = fv.val[self.tvar][:, 0]
        return self.gravity[None, :] * (1.0 - self.beta * (T - self.T0))[:, None]
