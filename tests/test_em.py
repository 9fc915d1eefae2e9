"""Time-harmonic electromagnetics (curl-curl) validation.

Plane wave E = y_hat e^{-ikx} in vacuum (e^{+iwt} convention): driven by a
Dirichlet E at x=0, absorbed by the first-order Silver-Mueller boundary at
x=L. Checks amplitude and phase against the exact traveling wave.
Reference: src/mm_fill_em.c assemble_emwave / assemble_ewave_curlcurl,
src/mm_em_bc.c absorbing BCs.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import EMAbsorbingBC, EMAbsorbingBCH, EMWave, EMWaveH
from goma_tpu.physics.em import E_IM, E_RE, H_IM, H_RE
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_em_plane_wave_absorbing():
    k = 2 * np.pi  # vacuum: omega = k (mu = eps = 1)
    L = 2.0
    mesh = rectangle_mesh(32, 6, elem="QUAD9", xlim=(0, L), ylim=(0, 0.75))
    eqs = [EMWave("real", omega=k, dim=2), EMWave("imag", omega=k, dim=2)]
    prob = Problem(mesh, eqs, {"mu_m": 1.0, "eps": 1.0})
    # inlet: E = y_hat (re 1, im 0); Ex = 0 everywhere on the boundary
    prob.add_dirichlet("left", E_RE, 1, 1.0)
    prob.add_dirichlet("left", E_IM, 1, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, E_RE, 0, 0.0)
        prob.add_dirichlet(ns, E_IM, 0, 0.0)
    for part in ("real", "imag"):
        prob.add_face_kernel("right", EMAbsorbingBC(part, omega=k, dim=2))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged  # linear problem: one Newton step
    assert res.iters <= 2

    c = mesh.coords
    ey_re = prob.get_nodal_field(res.x, E_RE, 1)
    ey_im = prob.get_nodal_field(res.x, E_IM, 1)
    # exact forward wave e^{-ikx}
    err_re = np.nanmax(np.abs(ey_re - np.cos(k * c[:, 0])))
    err_im = np.nanmax(np.abs(ey_im + np.sin(k * c[:, 0])))
    assert err_re < 0.03 and err_im < 0.03, (err_re, err_im)
    # energy flux conservation: |E| ~ 1 everywhere (traveling, not standing)
    amp = np.sqrt(np.nan_to_num(ey_re) ** 2 + np.nan_to_num(ey_im) ** 2)
    mask = ~np.isnan(ey_re)
    np.testing.assert_allclose(amp[mask], 1.0, atol=0.03)


def test_em_lossy_decay():
    """Conductive medium: k_c = omega sqrt(1 - i sigma/omega) gives an
    exponentially decaying wave; check the decay rate."""
    omega = 2 * np.pi
    sigma = 1.0
    L = 2.0
    mesh = rectangle_mesh(40, 4, elem="QUAD9", xlim=(0, L), ylim=(0, 0.5))
    eqs = [EMWave("real", omega=omega, dim=2), EMWave("imag", omega=omega, dim=2)]
    prob = Problem(mesh, eqs, {"mu_m": 1.0, "eps": 1.0, "sigma_em": sigma})
    prob.add_dirichlet("left", E_RE, 1, 1.0)
    prob.add_dirichlet("left", E_IM, 1, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, E_RE, 0, 0.0)
        prob.add_dirichlet(ns, E_IM, 0, 0.0)
    for part in ("real", "imag"):
        prob.add_face_kernel("right", EMAbsorbingBC(part, omega=omega, dim=2))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged

    # exact complex wavenumber: k_c^2 = omega^2 (1 - i sigma/omega),
    # e^{+iwt} convention -> E ~ e^{-i k_c x} with Im(k_c) < 0 decaying
    kc = omega * np.sqrt(1 - 1j * sigma / omega)
    kc = kc if kc.imag < 0 else -kc
    c = mesh.coords
    ey = (np.nan_to_num(prob.get_nodal_field(res.x, E_RE, 1))
          + 1j * np.nan_to_num(prob.get_nodal_field(res.x, E_IM, 1)))
    mask = ~np.isnan(prob.get_nodal_field(res.x, E_RE, 1))
    exact = np.exp(-1j * kc * c[mask, 0])
    # absorbing BC is tuned for lossless k; allow a few % from the mismatch
    err = np.max(np.abs(ey[mask] - exact))
    assert err < 0.08, err


def test_em_h_plane_wave_absorbing():
    """H-field formulation (EMWaveH, reference R_EM_H* equations): vacuum
    plane wave H = y_hat e^{-ikx} driven by an H Dirichlet at x=0 and
    absorbed by the dual Silver-Mueller boundary at x=L."""
    k = 2 * np.pi
    L = 2.0
    mesh = rectangle_mesh(32, 6, elem="QUAD9", xlim=(0, L), ylim=(0, 0.75))
    eqs = [EMWaveH("real", omega=k, dim=2), EMWaveH("imag", omega=k, dim=2)]
    prob = Problem(mesh, eqs, {"mu_m": 1.0, "eps": 1.0})
    prob.add_dirichlet("left", H_RE, 1, 1.0)
    prob.add_dirichlet("left", H_IM, 1, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, H_RE, 0, 0.0)
        prob.add_dirichlet(ns, H_IM, 0, 0.0)
    for part in ("real", "imag"):
        prob.add_face_kernel("right", EMAbsorbingBCH(part, omega=k, dim=2))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    assert res.iters <= 2

    c = mesh.coords
    hy_re = prob.get_nodal_field(res.x, H_RE, 1)
    hy_im = prob.get_nodal_field(res.x, H_IM, 1)
    err_re = np.nanmax(np.abs(hy_re - np.cos(k * c[:, 0])))
    err_im = np.nanmax(np.abs(hy_im + np.sin(k * c[:, 0])))
    assert err_re < 0.03 and err_im < 0.03, (err_re, err_im)
    amp = np.sqrt(np.nan_to_num(hy_re) ** 2 + np.nan_to_num(hy_im) ** 2)
    mask = ~np.isnan(hy_re)
    np.testing.assert_allclose(amp[mask], 1.0, atol=0.03)


def test_em_h_lossy_decay():
    """Conductive medium through the H formulation: the complex admittance
    1/eps_c sits inside the curl term (re/im coupling differs structurally
    from the E-form), but the dispersion relation is identical:
    kc^2 = omega^2 mu eps_c. Check the decaying wave against exact."""
    omega = 2 * np.pi
    sigma = 1.0
    L = 2.0
    mesh = rectangle_mesh(40, 4, elem="QUAD9", xlim=(0, L), ylim=(0, 0.5))
    eqs = [EMWaveH("real", omega=omega, dim=2),
           EMWaveH("imag", omega=omega, dim=2)]
    prob = Problem(mesh, eqs, {"mu_m": 1.0, "eps": 1.0, "sigma_em": sigma})
    prob.add_dirichlet("left", H_RE, 1, 1.0)
    prob.add_dirichlet("left", H_IM, 1, 0.0)
    for ns in ("left", "right", "top", "bottom"):
        prob.add_dirichlet(ns, H_RE, 0, 0.0)
        prob.add_dirichlet(ns, H_IM, 0, 0.0)
    for part in ("real", "imag"):
        prob.add_face_kernel("right", EMAbsorbingBCH(part, omega=omega, dim=2))
    prob.finalize()
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged

    kc = omega * np.sqrt(1 - 1j * sigma / omega)
    kc = kc if kc.imag < 0 else -kc
    c = mesh.coords
    hy = (np.nan_to_num(prob.get_nodal_field(res.x, H_RE, 1))
          + 1j * np.nan_to_num(prob.get_nodal_field(res.x, H_IM, 1)))
    mask = ~np.isnan(prob.get_nodal_field(res.x, H_RE, 1))
    exact = np.exp(-1j * kc * c[mask, 0])
    err = np.max(np.abs(hy[mask] - exact))
    assert err < 0.12, err
