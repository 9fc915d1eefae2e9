"""Multi-device assembly: element-sharded shard_map + psum must reproduce the
single-device assembly bit-for-bit (modulo reduction order) and run the full
Newton solve. The CPU analog of the reference's `mpirun -np N` on one box."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from goma_tpu.parallel import ShardedProblem
from goma_tpu.solvers import NewtonOptions, NewtonSolver
from tests.test_cavity import cavity_problem


def test_sharded_assembly_matches_single():
    devs = jax.devices()
    assert len(devs) == 8, devs
    _, prob = cavity_problem(n=5)
    sp = ShardedProblem(prob)
    x = np.random.RandomState(0).rand(prob.dofmap.n_dof)
    params = prob.base_params()
    R1, v1 = prob.assemble(x, params)
    R2, v2 = sp.assemble(x, params)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)


def test_sharded_newton_cavity():
    _, prob = cavity_problem(n=6, Re=50.0)
    sp = ShardedProblem(prob)
    solver = NewtonSolver(
        sp, NewtonOptions(max_iter=10, tol_residual=1e-10, linear_tol=1e-11,
                          gmres_restart=80, linear_maxiter=2000)
    )
    res = solver.solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged, res.summary()
    # iteration parity with the single-device path
    r1 = NewtonSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-10, linear_tol=1e-11,
                            gmres_restart=80, linear_maxiter=2000)
    ).solve(np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.iters == r1.iters
    np.testing.assert_allclose(res.x, r1.x, atol=1e-7)
