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


def test_latent_heat_internal_flux():
    """LATENT_HEAT_INTERNAL: prescribed normal velocity at the right face
    releases q = rho L v_n; steady conduction gives the exact linear
    profile slope q/k."""
    from goma_tpu.bc import LatentHeatInternal
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.physics import Energy

    rho, L_h, vn, k, Tb, Lx = 2.0, 5.0, 0.3, 4.0, 1.0, 1.0
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, Lx), ylim=(0, 0.2))
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    eqs = [Energy(interp="Q2", transient=False, convection=False),
           PassiveVar("velocity", 2, "Q2")]
    prob = Problem(mesh, eqs, {"rho": rho, "Cp": 1.0, "k": k})
    prob.add_dirichlet("left", "temperature", 0, Tb)
    prob.add_dirichlet("all", "velocity", 0, vn)
    prob.add_dirichlet("all", "velocity", 1, 0.0)
    prob.add_face_kernel("right", LatentHeatInternal(L_h))
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "velocity", 0, vn)
    from goma_tpu.solvers import NewtonOptions, NewtonSolver
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=5, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    c = mesh.coords
    # weak flux q on the energy rows means conduction satisfies
    # k dT/dn = -q at the face: T = Tb - (rho L vn / k) x
    np.testing.assert_allclose(
        T, Tb - rho * L_h * vn / k * c[:, 0], atol=1e-8)


def test_dvzdr_zero_symmetry():
    """DVZDR_ZERO on the swirl momentum: circular Couette with a free-spin
    outer wall dw/dr(R2) = 0 — exact solution w = A r + B/r with
    A R1 + B/R1 = W1, A = B/R2^2."""
    from goma_tpu.bc import DvzdrZero
    from goma_tpu.physics.fluid import SwirlMomentum
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    R1, R2, W1 = 1.0, 2.0, 3.0
    mesh = rectangle_mesh(2, 24, elem="QUAD9", xlim=(0, 0.2), ylim=(R1, R2))
    prob = Problem(mesh, [SwirlMomentum(interp="Q2", transient=False)],
                   {"rho": 1.0, "mu": 1.0}, coord="swirling")
    prob.add_dirichlet("bottom", "swirl", 0, W1)
    prob.add_face_kernel("top", DvzdrZero(nwall=(0.0, 1.0)))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=5, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    A = W1 * R1 / (R1**2 + R2**2)
    B = A * R2**2
    dm = prob.dofmap
    d = dm.dof_of_node_svar[:, dm.svar("swirl")]
    ok = d >= 0
    r = mesh.coords[ok, 1]
    np.testing.assert_allclose(np.asarray(res.x)[d[ok]], A * r + B / r,
                               rtol=2e-4)
