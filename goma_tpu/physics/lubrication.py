"""Lubrication (Reynolds film) equations.

Parity: reference shell-lubrication family ``src/mm_fill_shell.c``
(``assemble_lubrication`` LUBP equations) and ``src/mm_std_models_shell.c``
film closures. First implementation: the Reynolds equation solved on a 2D
(or 1D) domain parameterizing the film, with prescribed gap h(x, t) and
wall velocity U:

    div( h^3/(12 mu) grad p ) = U/2 . grad h + dh/dt

(incompressible, no-slip walls, no cavitation model yet — Goma's full shell
treatment on curved 3D shells with bulk coupling is a later stage).
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.physics.materials import prop

LUB_VAR = "lub_pressure"


class ReynoldsFilm(Equation):
    """Material keys: ``gap`` h(fv, mat, params) -> (nq,) (callable; may read
    fv.x and params["time"]), ``mu_lub``, ``wall_velocity`` (dim,) constant or
    callable."""

    def __init__(self, interp: str = "Q1", transient: bool = False):
        super().__init__(LUB_VAR, 1, interp)
        self.transient = transient

    def residual(self, fv, mat, params):
        import jax as _jax

        nq = fv.x.shape[0]
        gp = fv.grad[LUB_VAR][:, 0, :]
        mu = prop(mat, "mu_lub", fv, params, 1.0)
        hfun = mat["gap"]
        h = hfun(fv, mat, params) if callable(hfun) else jnp.broadcast_to(jnp.asarray(hfun), (nq,))
        U = mat.get("wall_velocity", None)

        gphi = fv.gphi[LUB_VAR]
        phi = fv.phi[LUB_VAR]
        mob = h**3 / (12.0 * mu)
        contrib = jnp.einsum("q,qk,qik->qi", mob, gp, gphi)

        if U is not None:
            Uv = U(fv, mat, params) if callable(U) else jnp.broadcast_to(
                jnp.asarray(U), (nq, fv.x.shape[1])
            )
            # Couette term: -div(U h / 2) tested weakly -> + (U h/2) . grad(phi)
            contrib = contrib - 0.5 * jnp.einsum("qk,q,qik->qi", Uv, h, gphi)
        if self.transient:
            # squeeze term dh/dt via AD of gap in params["time"]
            def h_of_t(t):
                p2 = dict(params)
                p2["time"] = t
                return hfun(fv, mat, p2) if callable(hfun) else jnp.broadcast_to(
                    jnp.asarray(hfun), (nq,)
                )

            _, dhdt = _jax.jvp(h_of_t, (params["time"],), (jnp.ones((), params["time"].dtype),))
            contrib = contrib + jnp.einsum("q,qi->qi", dhdt, phi)
        return contrib[:, None, :]
