"""Reaction-network kinetics closure (chemkin/senkin-core parity,
src/mm_chemkin.c / src/user_senkin.F hooks into assemble_mass_transport)."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Energy, ReactionNetwork, Species
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_reaction_diffusion_steady_profile():
    """A + A -> B (k const): steady 1D reaction-diffusion with c_A = 1 at
    both walls; FD-checked AD Jacobian and symmetric converged profile with
    interior consumption; total A consumed = 2x B produced (stoichiometry)."""
    net = ReactionNetwork(nu=[[-2, 1]], A=[3.0], T_ref=1.0)
    mesh = rectangle_mesh(12, 2, elem="QUAD9")
    prob = Problem(mesh, [Species(n_species=2, interp="Q2", transient=False,
                                  convection=False)],
                   {"diffusivity": np.array([1.0, 1.0]),
                    "species_source": net.species_source})
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "species", 0, 1.0)
        prob.add_dirichlet(ns, "species", 1, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=12, linear_solver="direct")
                       ).solve(np.full(prob.dofmap.n_dof, 0.5),
                               prob.base_params())
    assert res.converged
    # quadratic Newton tail = exact AD Jacobian through the rate law
    l2 = [r[1] for r in res.res_norms]
    assert l2[-1] < 1e-10
    dm = prob.dofmap
    cA = res.x[dm.dof_of_node_svar[:, dm.svar("species", 0)]]
    cB = res.x[dm.dof_of_node_svar[:, dm.svar("species", 1)]]
    assert np.nanmin(cA) > 0 and np.nanmin(cA) < 1.0  # interior consumption
    # flux balance: at steady state, D lap cA = 2 r, D lap cB = -r
    # -> cA + 2 cB is harmonic with boundary value 1 -> identically 1
    np.testing.assert_allclose(cA + 2 * cB, 1.0, atol=1e-9)


def test_reversible_reaction_equilibrium():
    """A <-> B with K_eq: a closed (no-flux) domain relaxes to
    c_B / c_A = K_eq."""
    Ke = 4.0
    net = ReactionNetwork(nu=[[-1, 1]], A=[10.0], K_eq=[Ke], T_ref=1.0)
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(mesh, [Species(n_species=2, interp="Q2", transient=False,
                                  convection=False)],
                   {"diffusivity": np.array([1.0, 1.0]),
                    "species_source": net.species_source})
    # anchor the (otherwise scale-free) steady state at one wall with an
    # equilibrium-consistent composition; unique solution = that constant
    prob.add_dirichlet("left", "species", 0, 0.2)
    prob.add_dirichlet("left", "species", 1, 0.2 * Ke)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    dm = prob.dofmap
    dA = dm.dof_of_node_svar[:, dm.svar("species", 0)]
    x0[dA[dA >= 0]] = 1.0
    res = NewtonSolver(prob, NewtonOptions(max_iter=25, linear_solver="direct")
                       ).solve(x0, prob.base_params())
    assert res.converged
    cA = res.x[dA[dA >= 0]]
    dB = dm.dof_of_node_svar[:, dm.svar("species", 1)]
    cB = res.x[dB[dB >= 0]]
    np.testing.assert_allclose(cA, 0.2, atol=1e-8)
    np.testing.assert_allclose(cB / cA, Ke, rtol=1e-7)


def test_exothermic_heat_release_coupling():
    """Heat release feeds the energy equation: with dH < 0 (exothermic) the
    steady temperature rises above the wall value."""
    net = ReactionNetwork(nu=[[-1]], A=[2.0], Ea=[1.0], dH=[-10.0])
    mesh = rectangle_mesh(8, 2, elem="QUAD9")
    prob = Problem(
        mesh,
        [Species(n_species=1, interp="Q2", transient=False, convection=False),
         Energy(interp="Q2", transient=False, convection=False)],
        {"diffusivity": 1.0, "k": 1.0,
         "species_source": net.species_source,
         "heat_source": net.heat_source})
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "species", 0, 1.0)
        prob.add_dirichlet(ns, "temperature", 0, 1.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=15, linear_solver="direct")
                       ).solve(np.full(prob.dofmap.n_dof, 1.0),
                               prob.base_params())
    assert res.converged
    dm = prob.dofmap
    T = res.x[dm.dof_of_node_svar[:, dm.svar("temperature")]]
    assert np.nanmax(T) > 1.0 + 1e-3
