"""Porous sink-mass (absorbing particles) equation.

Parity: assemble_pore_sink_mass / por_mass_source_model LINEAR model
(src/mm_fill_porous.c:734, :11271). Saturated uniform box: the sink mass
obeys s_dot = rho tau k2 (smax - s)/smax exactly (exponential approach to
smax); coupled with unsaturated flow the total liquid + absorbed mass is
conserved in a sealed box.
"""

import numpy as np

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics.porous import (PorousFlow, PorousSinkMass, VanGenuchten,
                                     sink_absorption_rate)
from goma_tpu.solvers import NewtonOptions
from goma_tpu.solvers.transient import TimeOptions, TransientSolver


def test_sink_mass_exponential():
    tau, smax, k2, rho = 2.0, 0.8, 1.5, 1.0
    mesh = rectangle_mesh(2, 2, elem="QUAD4")
    prob = Problem(mesh, [PorousSinkMass(model=None, interp="Q1")],
                   {"rho_liquid": rho, "sink_linear": (tau, smax, k2, 0.0)})
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    t_end = 0.3
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=6, tol_residual=1e-12, linear_solver="direct"),
        TimeOptions(dt0=0.005, t_end=t_end, theta=0.5, adapt=False))
    res = ts.run(x0, prob.base_params())
    rate = rho * tau * k2 / smax
    exact = smax * (1.0 - np.exp(-rate * res.t))
    np.testing.assert_allclose(res.x, exact, rtol=2e-4)


def test_sink_conservation_sealed_box():
    """Unsaturated sealed box: d/dt int (phi rho S + s) = 0."""
    vg = VanGenuchten(alpha=1.0, n=2.0, s_res=0.1)
    tau, smax, k2, rho, phi_por = 1.0, 0.5, 1.0, 1.0, 0.3
    mesh = rectangle_mesh(3, 3, elem="QUAD4")
    mat = {"rho_liquid": rho, "permeability": 1.0, "porosity": phi_por,
           "mu_liquid": 1.0, "sink_linear": (tau, smax, k2, 0.0)}
    prob = Problem(mesh, [PorousFlow(model=vg, interp="Q1"),
                          PorousSinkMass(model=vg, interp="Q1")], mat)
    prob.finalize()
    p0 = -0.3  # partially saturated
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "porous_pressure", 0, p0)

    from goma_tpu.post import volume_integral

    def total_mass(x):
        f = volume_integral(
            prob,
            lambda fv, m, prm: phi_por * rho
            * vg.saturation(fv.val["porous_pressure"][:, 0])
            + fv.val["sink_mass"][:, 0])
        return float(f(x, prob.base_params()))

    m0 = total_mass(x0)
    ts = TransientSolver(
        prob, NewtonOptions(max_iter=8, tol_residual=1e-11, linear_solver="direct"),
        TimeOptions(dt0=0.01, t_end=0.2, theta=0.5, adapt=False))
    res = ts.run(x0, prob.base_params())
    m1 = total_mass(res.x)
    s_end = prob.get_nodal_field(res.x, "sink_mass", 0)
    assert np.nanmin(s_end) > 1e-3  # absorption actually happened
    assert abs(m1 - m0) / abs(m0) < 5e-3, (m0, m1)
