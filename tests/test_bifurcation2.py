"""Pitchfork and Hopf tracking (LOCA src/loca_bord.c parity).

- Pitchfork: u'' + lam u - u^3 = 0, u(0)=u(1)=0 — supercritical pitchfork
  off the trivial branch at the first Dirichlet eigenvalue lam* = pi^2.
- Hopf: Brusselator reaction-diffusion with no-flux BCs — the uniform mode
  undergoes a Hopf bifurcation at exactly b* = 1 + a^2 with frequency
  omega = a (the k=0 mode lies in the FEM space, so the discrete values are
  exact up to solver tolerance).
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.continuation.bifurcation import hopf_track, pitchfork_track
from goma_tpu.physics import Species


def test_pitchfork_track_cubic_reaction():
    mesh = rectangle_mesh(10, 1, elem="QUAD9")

    def source(fv, mat, params):
        c = fv.val["species"]
        return params["lam"] * c - c**3

    prob = Problem(
        mesh,
        [Species(1, interp="Q2", transient=False, convection=False)],
        {"diffusivity": 1.0, "species_source": source},
    )
    prob.add_dirichlet("left", "species", 0, 0.0)
    prob.add_dirichlet("right", "species", 0, 0.0)
    prob.finalize()

    def make_params(lam):
        p = prob.base_params()
        p["lam"] = jnp.asarray(lam, dtype=prob.dtype)
        return p

    x0 = np.zeros(prob.dofmap.n_dof)
    psi = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "species", 0,
                               lambda X: np.sin(np.pi * X[:, 0]))
    res = pitchfork_track(prob, make_params, lam0=9.3, x0=x0, psi=psi)
    assert res.converged, res.res_norms
    # Q2 discretization: first eigenvalue error O(h^4) << 1e-3
    np.testing.assert_allclose(res.lam, np.pi**2, rtol=1e-3)
    assert abs(res.sigma) < 1e-8
    # null vector is the first eigenmode
    v = prob.get_nodal_field(res.x + 0 * res.x, "species", 0)  # symmetric soln = 0
    np.testing.assert_allclose(prob.get_nodal_field(res.x, "species", 0), 0.0,
                               atol=1e-8)
    vn = prob.get_nodal_field(
        np.asarray(res.null_vector) / np.max(np.abs(res.null_vector)), "species", 0)
    mode = np.sin(np.pi * mesh.coords[:, 0])
    sign = np.sign(np.dot(vn, mode))
    np.testing.assert_allclose(sign * vn, mode, atol=5e-3)


def test_hopf_track_brusselator():
    a = 1.3
    mesh = rectangle_mesh(3, 3, elem="QUAD4")

    def source(fv, mat, params):
        u = fv.val["species"][:, 0]
        v = fv.val["species"][:, 1]
        b = params["b"]
        s1 = a - (b + 1.0) * u + u * u * v
        s2 = b * u - u * u * v
        return jnp.stack([s1, s2], axis=1)

    prob = Problem(
        mesh,
        [Species(2, interp="Q1", transient=True, convection=False)],
        {"diffusivity": jnp.array([0.02, 0.05]), "species_source": source},
    )
    prob.finalize()

    def make_params(b):
        p = prob.base_params()
        p["b"] = jnp.asarray(b, dtype=prob.dtype)
        return p

    b0 = 1.0 + a * a + 0.25
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "species", 0, a)
    x0 = prob.set_nodal_field(x0, "species", 1, b0 / a)
    res = hopf_track(prob, make_params, lam0=b0, omega0=1.15 * a, x0=x0,
                     tol=1e-9)
    assert res.converged, res.res_norms
    np.testing.assert_allclose(res.lam, 1.0 + a * a, rtol=1e-8)
    np.testing.assert_allclose(abs(res.omega), a, rtol=1e-8)
    # steady state at the Hopf point is the uniform branch at b*
    u = prob.get_nodal_field(res.x, "species", 0)
    v = prob.get_nodal_field(res.x, "species", 1)
    np.testing.assert_allclose(u, a, rtol=1e-8)
    np.testing.assert_allclose(v, (1.0 + a * a) / a, rtol=1e-8)
