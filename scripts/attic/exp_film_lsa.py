"""Exploratory: deforming-mesh 3D-of-2D LSA on capillary film leveling.

Exact Stokes dispersion (film depth H, no-slip bottom, free top, capillary
only): s = -(sigma b / 2 mu) (sinh q cosh q - q)/(cosh^2 q + q^2), q = bH.
"""

import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (Continuity, Momentum, EllipticMesh,
                              zmode_equations, CapillaryZNormal, CapillaryZW)
from goma_tpu.bc import CapillaryBC, KinematicBC
from goma_tpu.continuation.stability import solve_stability

H, W = 1.0, 0.25
mu, rho, sig = 1.0, 1.0, 1.0
nx, ny = 2, 12
mesh = rectangle_mesh(nx, ny, elem="QUAD9", xlim=(0, W), ylim=(0, H))
eqs = [Momentum(dim=2, interp="Q2", transient=True, convection=True),
       Continuity(interp="Q1"),
       EllipticMesh(dim=2, interp="Q2")]
eqs += zmode_equations(dim=2)
prob = Problem(mesh, eqs, {"rho": rho, "mu": mu, "sigma": sig})
for comp in (0, 1):
    prob.add_dirichlet("bottom", "velocity", comp, 0.0)
    prob.add_dirichlet("bottom", "mesh_displacement", comp, 0.0)
prob.add_dirichlet("bottom", "nm_w", 0, 0.0)
for ns in ("left", "right"):
    prob.add_dirichlet(ns, "velocity", 0, 0.0)
    prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
prob.add_face_kernel("top", CapillaryBC(dim=2))
prob.add_face_kernel("top", KinematicBC(dim=2))
prob.add_face_kernel("top", CapillaryZNormal(dim=2))
prob.add_face_kernel("top", CapillaryZW())
prob.finalize()
print("n_dof:", prob.dofmap.n_dof)

x0 = np.zeros(prob.dofmap.n_dof)
for b in (0.4, 0.8):
    q = b * H
    s_exact = -(sig * b / (2 * mu)) * (np.sinh(q) * np.cosh(q) - q) / (
        np.cosh(q) ** 2 + q ** 2)
    params = prob.base_params(beta=jnp.asarray(b))
    r = solve_stability(prob, x0, params, n_modes=6, shift=s_exact)
    print(f"beta={b}: exact {s_exact:.6e}")
    print("  growth rates:", np.array2string(r.growth_rates[:6], precision=4))
