"""3D validation: manufactured Navier-Stokes solution on HEX27 Q2/Q1.

The exact body force is computed by jax AD of the chosen exact fields
(f = rho u.grad u - div sigma evaluated pointwise), so this checks the whole
3D pipeline — hex basis, mixed dof map, assembly, BCs — against an exact
nontrivial solution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.solvers import NewtonOptions, NewtonSolver

MU, RHO = 0.7, 1.0


def u_exact(x):
    # divergence-free: curl of a vector potential
    X, Y, Z = x[0], x[1], x[2]
    return jnp.array(
        [
            jnp.sin(jnp.pi * Y) * Z * (1 - Z),
            jnp.sin(jnp.pi * Z) * X * (1 - X),
            jnp.sin(jnp.pi * X) * Y * (1 - Y),
        ]
    ) * 0.1


def p_exact(x):
    return jnp.cos(jnp.pi * x[0]) * x[1] + x[2]


def body_force(fv, mat, params):
    def f_point(x):
        gu = jax.jacfwd(u_exact)(x)  # (3, 3): gu[a,k] = du_a/dx_k
        u = u_exact(x)
        conv = RHO * gu @ u
        lap = jnp.stack([jnp.trace(jax.hessian(lambda y: u_exact(y)[a])(x)) for a in range(3)])
        gp = jax.jacfwd(p_exact)(x)
        return (conv - MU * lap + gp) / RHO

    return jax.vmap(f_point)(fv.x)


def test_manufactured_ns_3d():
    mesh = box_mesh(3, 3, 3, elem="HEX27")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(
        mesh,
        [Momentum(dim=3, interp="Q2", transient=False), Continuity(interp="Q1")],
        {"rho": RHO, "mu": MU, "body_force": body_force},
    )
    uex_np = lambda c: np.asarray(jax.vmap(u_exact)(jnp.asarray(c)))

    def mkbc(comp):
        return lambda c: uex_np(c)[:, comp]

    for ns in ("left", "right", "top", "bottom", "front", "back"):
        for comp in range(3):
            prob.add_dirichlet(ns, "velocity", comp, mkbc(comp))
    prob.add_dirichlet("pin", "pressure", 0,
                       float(p_exact(jnp.asarray(mesh.coords[0]))))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()

    U = np.stack([prob.get_nodal_field(res.x, "velocity", c) for c in range(3)], axis=1)
    Uex = uex_np(mesh.coords)
    err = np.max(np.abs(U - Uex))
    # Q2 on 3^3: measured 1.28e-3 converging at O(h^3) (ratio 2.58 to 4^3)
    assert err < 1.5e-3, err

    p = prob.get_nodal_field(res.x, "pressure")
    pex = np.asarray(jax.vmap(p_exact)(jnp.asarray(mesh.coords)))
    ok = ~np.isnan(p)
    diff = p[ok] - pex[ok]
    # Q1 pressure on a 3^3 mesh: O(h^2) with corner peaks ~0.11
    assert np.max(np.abs(diff)) < 0.15
    assert np.sqrt(np.mean(diff**2)) < 0.06  # measured 0.049 at 3^3, O(h^2)


def test_poisson_3d_hex():
    mesh = box_mesh(4, 4, 4, elem="HEX27")

    def source(fv, mat, params):
        x, y, z = fv.x[:, 0], fv.x[:, 1], fv.x[:, 2]
        return 3 * jnp.pi**2 * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    prob = Problem(mesh, [Energy(interp="Q2", transient=False, convection=False)],
                   {"k": 1.0, "heat_source": source})
    for ns in ("left", "right", "top", "bottom", "front", "back"):
        prob.add_dirichlet(ns, "temperature", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_tol=1e-11,
                            linear_maxiter=2000)
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature")
    ex = np.prod(np.sin(np.pi * mesh.coords), axis=1)
    assert np.max(np.abs(T - ex)) < 4e-3
