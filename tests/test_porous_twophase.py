"""Two-phase (liquid+gas) porous flow (POROUS_TWO_PHASE parity)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import TwoPhasePorous, VanGenuchten
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.solvers.transient import TimeOptions, TransientSolver
from goma_tpu.utils.numjac import numerical_jacobian_check

MAT = {
    "permeability": 0.1, "porosity": 0.4, "mu_liquid": 1.0, "mu_gas": 0.05,
    "rho_liquid": 1.0, "rho_gas": 0.1, "gravity_vec": [0.0, -1.0],
}


def _problem(transient=True, compressible=False):
    mesh = rectangle_mesh(2, 8, elem="QUAD4")
    vg = VanGenuchten(alpha=2.0, n=2.0)
    prob = Problem(
        mesh,
        [TwoPhasePorous(vg, transient=transient, compressible=compressible)],
        MAT,
    )
    return mesh, prob


def test_hydrostatic_equilibrium():
    """Each phase hydrostatic (grad p = rho g) is an exact steady state."""
    mesh, prob = _problem(transient=False)
    prob.add_dirichlet("bottom", "porous_pressure", 0, 0.0)
    prob.add_dirichlet("bottom", "porous_pressure", 1, 0.5)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "porous_pressure", 0, lambda X: -0.9 * X[:, 1])
    x0 = prob.set_nodal_field(x0, "porous_pressure", 1, lambda X: 0.5 - 0.08 * X[:, 1])
    res = NewtonSolver(prob, NewtonOptions(max_iter=15, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        jnp.asarray(x0), prob.base_params())
    assert res.converged, res.summary()
    pl = prob.get_nodal_field(res.x, "porous_pressure", 0)
    pg = prob.get_nodal_field(res.x, "porous_pressure", 1)
    y = mesh.coords[:, 1]
    np.testing.assert_allclose(pl, -1.0 * y, atol=1e-9)   # rho_l g
    np.testing.assert_allclose(pg, 0.5 - 0.1 * y, atol=1e-9)  # rho_g g


def test_closed_domain_conserves_phase_content():
    """No-flux (natural) boundaries: liquid content phi*int S dV is conserved
    while capillary pressure equilibrates. Compressible gas fixes the
    pressure level (an incompressible closed box is defined only up to a
    constant)."""
    from goma_tpu.post.postproc import volume_integral

    mesh, prob = _problem(transient=True, compressible=True)
    prob.finalize()
    eq = prob.equations[0][0]

    def liquid_content(fv, mat, params):
        pc = fv.val["porous_pressure"][:, 1] - fv.val["porous_pressure"][:, 0]
        return MAT["porosity"] * eq._sat_of_pc(pc)

    content = volume_integral(prob, liquid_content)
    mat_ng = dict(MAT)
    mat_ng.pop("gravity_vec")
    prob.materials = [mat_ng]  # no gravity: closed box equilibrates to uniform
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, "porous_pressure", 0,
                              lambda X: -0.3 - 0.2 * np.sin(np.pi * X[:, 1]))
    x0 = prob.set_nodal_field(x0, "porous_pressure", 1, 0.1)
    params = prob.base_params()
    c0 = float(content(jnp.asarray(x0), params))
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-10, linear_solver="direct"),
        TimeOptions(dt0=0.02, t_end=8.0, adapt=True, max_dt=1.5, theta=0.0),
    )
    res = ts.run(jnp.asarray(x0), params)
    c1 = float(content(jnp.asarray(res.x), params))
    # the chain-rule storage phi S'(pc) pcdot is conservative only up to
    # O(dt) per step (the non-conservative form the reference also uses);
    # 200 BE steps accumulate ~1e-5 relative drift
    np.testing.assert_allclose(c1, c0, rtol=1e-4)
    # equilibrium: capillary pressure uniform
    pc = (prob.get_nodal_field(res.x, "porous_pressure", 1)
          - prob.get_nodal_field(res.x, "porous_pressure", 0))
    assert pc.std() < 2e-4 * max(abs(pc.mean()), 1.0), pc.std()


def test_twophase_jacobian_matches_fd():
    mesh, prob = _problem(transient=True, compressible=True)
    prob.finalize()
    rng = np.random.RandomState(2)
    x = np.zeros(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "porous_pressure", 0,
                             -0.5 + 0.1 * rng.rand(mesh.n_nodes))
    x = prob.set_nodal_field(x, "porous_pressure", 1,
                             0.8 + 0.1 * rng.rand(mesh.n_nodes))
    p = prob.base_params()
    p["ct"] = jnp.asarray(3.0, dtype=prob.dtype)
    chk = numerical_jacobian_check(prob, x, p, n_columns=12, h=1e-6)
    assert chk.ok, chk.report()
