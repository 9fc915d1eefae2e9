"""APR/API_VELOCITY piston drive: the imposed flux pair (dp_r/dn=+v,
dp_i/dn=-v) launches the outgoing wave A = -v(1+i)/k through the
Sommerfeld boundary; exact traveling-wave profile."""

import numpy as np

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import AcousticHelmholtz, SommerfeldBC
from goma_tpu.physics.acoustic import APR, API, AcousticVelocityBC
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_acoustic_velocity_piston():
    k, v, L = 2 * np.pi, 0.7, 2.0
    mesh = rectangle_mesh(40, 3, elem="QUAD9", xlim=(0, L), ylim=(0, 0.3))
    eqs = [AcousticHelmholtz("real", k), AcousticHelmholtz("imag", k)]
    prob = Problem(mesh, eqs, {})
    for part in ("real", "imag"):
        prob.add_face_kernel("left", AcousticVelocityBC(part, v))
        prob.add_face_kernel("right", SommerfeldBC(part, k))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=3, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    pr = prob.get_nodal_field(res.x, APR, 0)
    pi = prob.get_nodal_field(res.x, API, 0)
    x = mesh.coords[:, 0]
    A = -v * (1 + 1j) / k
    exact = A * np.exp(-1j * k * x)
    np.testing.assert_allclose(pr, exact.real, atol=0.02 * abs(A))
    np.testing.assert_allclose(pi, exact.imag, atol=0.02 * abs(A))


def test_ls_acoustic_radiation_total_force():
    """LS_ACOUSTIC_SOURCE: flat interface in a uniform acoustic field —
    the band integral of delta |grad F| is 1, so the net momentum-row force
    equals ars_jump P0^2/(4 omega) along n_ls exactly."""
    import jax.numpy as jnp
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.physics.acoustic import LSAcousticRadiation
    from goma_tpu.physics.level_set import FILL_VAR, FillEquation

    P0, omega, ars = 2.0, 3.0, 0.8
    mesh = rectangle_mesh(8, 4, elem="QUAD9")
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Momentum(dim=2, interp="Q2", transient=False),
           Continuity(interp="Q1"),
           FillEquation(interp="Q2", supg=0.0, transient=False),
           AcousticHelmholtz("real", 1.0), AcousticHelmholtz("imag", 1.0),
           LSAcousticRadiation(dim=2, omega=omega, ars_jump=ars)]
    prob = Problem(mesh, eqs, {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("all", FILL_VAR, 0, lambda c: c[:, 0] - 0.5)
    prob.add_dirichlet("all", APR, 0, P0)
    prob.add_dirichlet("all", API, 0, 0.0)
    prob.finalize()
    dm = prob.dofmap
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, FILL_VAR, 0, mesh.coords[:, 0] - 0.5)
    x0 = prob.set_nodal_field(x0, APR, 0, P0)
    params = prob.base_params(ls_eps=jnp.asarray(0.15, dtype=prob.dtype))
    import jax.numpy as _j
    R_vec = np.asarray(prob.residual(_j.asarray(x0), params))
    du = dm.dof_of_node_svar[:, dm.svar("velocity", 0)]
    tot = R_vec[du[du >= 0]].sum()
    f_exact = ars * P0**2 / (4 * omega)
    # residual = -int phi f n_x; n_ls = +x_hat -> sum = -f_exact
    np.testing.assert_allclose(-tot, f_exact, rtol=5e-3)
