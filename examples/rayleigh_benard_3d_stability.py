"""Normal-mode (3D-of-2D) stability: Rayleigh-Benard neutral curve.

The 2D base state is pure conduction; z-periodic perturbations at wavenumber
beta are governed by the real cos/sin-mode equations (reference
LSA_3D_OF_2D, src/ac_stability.c). The free-slip critical point
Ra_c = 27 pi^4 / 4 = 657.51 at beta_c = pi/sqrt(2) is recovered, and a
wavenumber sweep reuses ONE compiled assembly because beta is a traced
parameter.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.continuation import solve_stability
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (NormalModeContinuity, NormalModeEnergy,
                              NormalModeMomentum, NormalModeW)
from goma_tpu.physics.normal_mode import NM_T, NM_U


def build(Ra, n=6):
    mesh = rectangle_mesh(3, n, elem="QUAD9", xlim=(0, 0.5), ylim=(0, 1))
    prob = Problem(mesh, [NormalModeMomentum(), NormalModeW(),
                          NormalModeContinuity(), NormalModeEnergy()],
                   {"rho": 1.0, "mu": 1.0, "k": 1.0, "Cp": 1.0,
                    "buoyancy": (0.0, Ra)},
                   external_fields=("u0", "v0", "T0"))
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, NM_U, 1, 0.0)
        prob.add_dirichlet(ns, NM_T, 0, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, NM_U, 0, 0.0)
    prob.finalize()
    dt = prob.dtype
    params = prob.base_params(
        beta=jnp.asarray(0.0, dtype=dt),
        ext_u0=jnp.zeros(mesh.n_nodes, dtype=dt),
        ext_v0=jnp.zeros(mesh.n_nodes, dtype=dt),
        ext_T0=jnp.asarray(1.0 - mesh.coords[:, 1], dtype=dt))
    return prob, params


def sweep(Ra=700.0, betas=(1.2, 1.8, 2.221, 2.8, 3.6)):
    prob, params = build(Ra)
    out = []
    for b in betas:
        p = dict(params)
        p["beta"] = jnp.asarray(b, dtype=prob.dtype)
        r = solve_stability(prob, np.zeros(prob.dofmap.n_dof), p,
                            n_modes=2, shift=0.5)
        out.append((b, float(r.growth_rates.real.max())))
    return out


if __name__ == "__main__":
    for b, s in sweep():
        print(f"beta={b:5.3f}  sigma_max={s:+.3f}")
