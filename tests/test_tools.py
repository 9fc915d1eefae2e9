"""Tool tests: numerical-Jacobian checker, element quality + transient
quality guard, particle tracing."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.post.particles import FieldSampler, trace_particles
from goma_tpu.post.quality import element_quality
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from goma_tpu.utils.numjac import numerical_jacobian_check


def test_numjac_clean_on_ns():
    from tests.test_cavity import cavity_problem

    _, prob = cavity_problem(n=4)
    rng = np.random.RandomState(0)
    x = 0.1 * rng.randn(prob.dofmap.n_dof)
    res = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=15)
    assert res.ok, res.report()


def test_numjac_catches_wrong_jacobian():
    """A kernel with a deliberately broken derivative (via stop_gradient)
    must be flagged."""
    import jax

    class BadEnergy(Energy):
        def residual(self, fv, mat, params):
            T = jax.lax.stop_gradient(fv.val["temperature"][:, 0])  # broken
            phi = fv.phi["temperature"]
            gphi = fv.gphi["temperature"]
            gT = fv.grad["temperature"][:, 0, :]
            c = jnp.einsum("qk,qik->qi", gT, gphi) + jnp.einsum("q,qi->qi", T**2, phi)
            return c[:, None, :]

    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    prob = Problem(mesh, [BadEnergy(interp="Q2")], {})
    prob.finalize()
    x = np.random.RandomState(1).rand(prob.dofmap.n_dof)
    res = numerical_jacobian_check(prob, x, prob.base_params(), n_columns=30)
    assert not res.ok


def test_element_quality_and_guard():
    from goma_tpu.physics import EllipticMesh

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2"), EllipticMesh(2)], {"k": 1.0})
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    q = element_quality(prob, x0)
    assert q.ok and q.min_detJ > 0
    # tangle the mesh: displace interior nodes past neighbors
    x_bad = prob.set_nodal_field(
        x0, "mesh_displacement", 0,
        lambda c: 0.9 * np.sin(2 * np.pi * c[:, 0]),
    )
    q2 = element_quality(prob, x_bad)
    assert not q2.ok


def test_particle_tracing_rigid_rotation():
    """Tracer in a rigid-rotation velocity field follows a circle."""
    mesh = rectangle_mesh(10, 10, elem="QUAD9", xlim=(-1, 1), ylim=(-1, 1))
    prob = Problem(mesh, [Momentum(dim=2, transient=False), Continuity()],
                   {"rho": 1.0, "mu": 1.0})
    prob.finalize()
    x = np.zeros(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "velocity", 0, lambda c: -c[:, 1])
    x = prob.set_nodal_field(x, "velocity", 1, lambda c: c[:, 0])

    # sampler reproduces the field at arbitrary points
    s = FieldSampler(prob)
    pts = np.array([[0.3, 0.2], [-0.5, 0.1], [0.05, -0.6]])
    v = s.sample(x, "velocity", pts)
    np.testing.assert_allclose(v, np.stack([-pts[:, 1], pts[:, 0]], axis=1), atol=1e-10)

    tr = trace_particles(prob, x, np.array([[0.4, 0.0]]), t_end=np.pi / 2, dt=0.01)
    assert tr.alive.all()
    end = tr.positions[-1, 0]
    t = tr.times[-1]  # dt rounding: nt*dt may differ slightly from t_end
    np.testing.assert_allclose(end, [0.4 * np.cos(t), 0.4 * np.sin(t)], atol=2e-5)
    # radius conserved along the whole trace
    rads = np.linalg.norm(tr.positions[:, 0, :], axis=1)
    np.testing.assert_allclose(rads, 0.4, atol=2e-4)


def test_particles_leave_domain():
    mesh = rectangle_mesh(5, 5, elem="QUAD9")
    prob = Problem(mesh, [Momentum(dim=2, transient=False), Continuity()], {"mu": 1.0})
    prob.finalize()
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "velocity", 0, 1.0)
    tr = trace_particles(prob, x, np.array([[0.9, 0.5]]), t_end=0.5, dt=0.05)
    assert not tr.alive.any()
    assert tr.positions[-1, 0, 0] <= 1.0 + 1e-6


def test_variable_stats():
    """variable_stats parity (src/rf_solve.c:3370): per-variable min/max/
    mean/L2 incl. elemental (P0/P1E) dofs."""
    import jax.numpy as jnp
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Continuity, Momentum, VEStress
    from goma_tpu.post import format_stats, variable_stats

    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    prob = Problem(mesh, [Momentum(dim=2, interp="Q2", transient=False),
                          Continuity(interp="Q1"),
                          VEStress(0, dim=2, lam=0.1, mu_p=1.0, interp="P1E",
                                   transient=False)], {"rho": 1.0, "mu": 1.0})
    prob.finalize()
    x = np.arange(prob.dofmap.n_dof, dtype=float)
    st = variable_stats(prob, x)
    assert "velocity[0]" in st and "pressure" in st and "stress0[0]" in st
    for s in st.values():
        assert s["min"] <= s["mean"] <= s["max"]
    txt = format_stats(st)
    assert "velocity[0]" in txt and "L2" in txt


def test_matrix_dump_roundtrip(tmp_path):
    """sl_matrix_dump parity: dumped CSR system reloads and reproduces the
    assembled operator action."""
    import jax.numpy as jnp
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import Energy
    from goma_tpu.utils.matrix_dump import dump_matrix, load_matrix

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2", transient=False,
                                 convection=False)], {"k": 1.0})
    prob.add_dirichlet("left", "temperature", 0, 1.0)
    prob.finalize()
    x = np.random.RandomState(0).rand(prob.dofmap.n_dof)
    p = prob.base_params()
    f = dump_matrix(prob, x, p, str(tmp_path / "sys.npz"))
    A, R = load_matrix(f)
    # operator action matches a finite difference of the residual
    v = np.random.RandomState(1).rand(prob.dofmap.n_dof)
    eps = 1e-7
    Rp = np.asarray(prob.residual(jnp.asarray(x + eps * v), p))
    Rm = np.asarray(prob.residual(jnp.asarray(x - eps * v), p))
    np.testing.assert_allclose(A @ v, (Rp - Rm) / (2 * eps), atol=1e-6)
