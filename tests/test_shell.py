"""Shell (curve-element) tests: string deflection analytic; Reynolds film on
a shell block; shell-bulk coupling through shared nodes."""

import numpy as np
import jax.numpy as jnp
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import (
    Energy,
    ReynoldsFilm,
    ShellConduction,
    TensionedString,
    attach_shell_block,
)
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_tensioned_string_parabola():
    """-T w'' = q on the bottom boundary: w = q x (L - x) / (2T)."""
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, 2.0))
    bi = attach_shell_block(mesh, "bottom", "string")
    T, q = 3.0, 1.5
    eqs_per_block = [[], [TensionedString(T, q, interp="Q2")]]
    prob = Problem(mesh, eqs_per_block, [{}, {}])
    # fix the string ends
    end_nodes = np.array([n for n in mesh.nodesets["bottom"]
                          if abs(mesh.coords[n, 0]) < 1e-12
                          or abs(mesh.coords[n, 0] - 2.0) < 1e-12], dtype=np.int32)
    mesh.nodesets["string_ends"] = end_nodes
    prob.add_dirichlet("string_ends", "shell_deflection", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    w = prob.get_nodal_field(res.x, "shell_deflection")
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0]
    np.testing.assert_allclose(w[bot], q * xb * (2.0 - xb) / (2 * T), atol=1e-10)


def test_reynolds_on_shell_block():
    """The flat-film ReynoldsFilm kernel runs unchanged on a curve block."""
    mu, U, h1, h2, L = 0.1, 2.0, 0.2, 0.1, 1.0
    mesh = rectangle_mesh(30, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.05))
    attach_shell_block(mesh, "bottom", "film")
    gap = lambda fv, mat, params: h1 + (h2 - h1) * fv.x[:, 0] / L
    eqs = [[], [ReynoldsFilm(interp="Q2")]]
    prob = Problem(mesh, eqs, [{}, {"gap": gap, "mu_lub": mu,
                                    "wall_velocity": np.array([U, 0.0])}])
    ends = np.array([n for n in mesh.nodesets["bottom"]
                     if abs(mesh.coords[n, 0]) < 1e-12
                     or abs(mesh.coords[n, 0] - L) < 1e-12], dtype=np.int32)
    mesh.nodesets["film_ends"] = ends
    prob.add_dirichlet("film_ends", "lub_pressure", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params()
    )
    assert res.converged
    p = prob.get_nodal_field(res.x, "lub_pressure")
    bot = mesh.nodesets["bottom"]
    xb = np.sort(mesh.coords[bot, 0])
    pb = p[bot][np.argsort(mesh.coords[bot, 0])]
    # quadrature reference (same as the bulk-domain lubrication test)
    xs = np.linspace(0, L, 4001)
    h = h1 + (h2 - h1) * xs / L
    a = np.trapezoid(6 * mu * U / h**2, xs)
    b = np.trapezoid(12 * mu / h**3, xs)
    C = -a / b
    pr = np.cumsum((6 * mu * U / h**2 + 12 * mu * C / h**3)) * (xs[1] - xs[0])
    pr -= pr[0]
    np.testing.assert_allclose(pb, np.interp(xb, xs, pr), atol=0.02 * np.abs(pr).max())


def test_shell_bulk_coupled_conduction():
    """Bulk conduction + shell surface conduction on shared temperature dofs:
    ks=0 reproduces the bulk-only solution; large ks flattens the boundary
    temperature (shell short-circuits the wall)."""
    def solve(ks):
        mesh = rectangle_mesh(6, 6, elem="QUAD9")
        if ks is not None:
            attach_shell_block(mesh, "bottom", "cond")
            eqs = [[Energy(interp="Q2", transient=False, convection=False)],
                   [ShellConduction(ks, interp="Q2")]]
            mats = [{"k": 1.0}, {}]
        else:
            eqs = [[Energy(interp="Q2", transient=False, convection=False)]]
            mats = [{"k": 1.0}]
        prob = Problem(mesh, eqs, mats)
        # 2D field: hot left wall, cold top, natural elsewhere — the bottom
        # edge profile is then genuinely curved
        prob.add_dirichlet("left", "temperature", 0, 1.0)
        prob.add_dirichlet("top", "temperature", 0, 0.0)
        prob.finalize()
        res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-11,
                                               linear_solver="direct")).solve(
            np.zeros(prob.dofmap.n_dof), prob.base_params()
        )
        assert res.converged
        return mesh, prob.get_nodal_field(res.x, "temperature")

    mesh0, T_none = solve(None)
    _, T_zero = solve(0.0)
    np.testing.assert_allclose(T_zero, T_none, atol=1e-12)

    _, T_big = solve(50.0)
    # large in-shell conduction flattens the bottom-edge profile
    bot = mesh0.nodesets["bottom"]
    order = np.argsort(mesh0.coords[bot, 0])
    prof0 = T_none[bot][order]
    prof1 = T_big[bot][order]
    assert np.std(prof0) > 1e-3  # baseline profile is genuinely curved
    assert np.std(prof1) < 0.3 * np.std(prof0)

def test_shell_structure_elastica():
    """Structural shell pair (assemble_shell_structure parity): with the
    tension pinned to T0 the curvature obeys D K'' - T0 K = P exactly.
    T0 = 0: K = -P x (L-x) / (2D), a parabola exact in the Q2 basis."""
    from goma_tpu.physics.shell import ShellCurvature, ShellTension

    D, P, L = 2.0, 1.5, 2.0
    mesh = rectangle_mesh(8, 2, elem="QUAD9", xlim=(0, L))
    attach_shell_block(mesh, "bottom", "sheet")
    eqs = [[], [ShellCurvature(bend_stiffness=D, interp="Q2"),
                ShellTension(bend_stiffness=D, interp="Q2")]]
    prob = Problem(mesh, eqs, [{}, {"p_load": P}])
    ends = np.array([n for n in mesh.nodesets["bottom"]
                     if abs(mesh.coords[n, 0]) < 1e-12
                     or abs(mesh.coords[n, 0] - L) < 1e-12], dtype=np.int32)
    mesh.nodesets["sheet_ends"] = ends
    prob.add_dirichlet("sheet_ends", "sh_K", 0, 0.0)
    # pin the tension everywhere -> decoupled linear curvature equation
    prob.add_dirichlet("bottom", "sh_tens", 0, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    K = prob.get_nodal_field(res.x, "sh_K")
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0]
    np.testing.assert_allclose(K[bot], -P * xb * (L - xb) / (2 * D), atol=1e-9)

    # coupled (free tension, one end anchored): first integral
    # T = -D K^2 / 2 + C must hold along the sheet
    prob2 = Problem(mesh, eqs, [{}, {"p_load": P}])
    prob2.add_dirichlet("sheet_ends", "sh_K", 0, 0.0)
    mesh.nodesets["sheet_left"] = ends[:1]
    prob2.add_dirichlet("sheet_left", "sh_tens", 0, 1.0)
    prob2.finalize()
    res2 = NewtonSolver(prob2, NewtonOptions(max_iter=12, tol_residual=1e-11,
                                             linear_solver="direct")).solve(
        np.zeros(prob2.dofmap.n_dof), prob2.base_params())
    assert res2.converged
    K2 = prob2.get_nodal_field(res2.x, "sh_K")[bot]
    T2 = prob2.get_nodal_field(res2.x, "sh_tens")[bot]
    # the first integral holds pointwise only in the continuum; check it to
    # a few % of the tension variation D K^2/2 it balances
    C = T2 + D * K2**2 / 2
    span = np.nanmax(D * K2**2 / 2) - np.nanmin(D * K2**2 / 2)
    assert np.nanstd(C) < 0.05 * span, (np.nanstd(C), span)


def test_tfmp_sealed_squeeze_film():
    """Thin-film multiphase (assemble_shell_tfmp parity): sealed squeeze
    film with compressible gas — closing the gap conserves liquid volume
    (h S = h0 S0) and gas mass (rho_g h (1-S) = const, rho_g ~ P), giving
    the exact 0-D solution S = S0 h0/h, P = P0 h0 (1-S0)/(h - h0 S0).
    Exercises both transient terms incl. the S dh/dt and rho (1-S) dh/dt
    squeeze couplings."""
    from goma_tpu.physics.lubrication import TFMPBound, TFMPMass
    from goma_tpu.solvers.transient import TimeOptions, TransientSolver

    h0, S0, P0, a = 0.2, 0.6, 1.0, 0.5
    mesh = rectangle_mesh(6, 1, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.05))
    attach_shell_block(mesh, "bottom", "film")

    def gap(fv, mat, params):
        return h0 * (1.0 - a * params["time"]) * jnp.ones_like(fv.x[:, 0])

    eqs = [[], [TFMPMass(interp="Q2", transient=True),
                TFMPBound(interp="Q2", transient=True)]]
    mat = {"gap": gap, "mu_l": 1.0, "mu_g": 0.5,
           "rho_g": lambda P: 0.8 * P}
    prob = Problem(mesh, eqs, [{}, mat])
    prob.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "tfmp_sat", 0, S0)
    x0 = prob.set_nodal_field(x0, "tfmp_pres", 0, P0)
    t_end = 0.6  # h shrinks to 0.7 h0
    ts = TimeOptions(dt0=0.005, t_end=t_end, theta=0.5, adapt=False)
    res = TransientSolver(
        prob, NewtonOptions(max_iter=10, tol_residual=1e-12,
                            linear_solver="direct"), ts).run(
        x0, prob.base_params())
    bot = mesh.nodesets["bottom"]
    S = prob.get_nodal_field(res.x, "tfmp_sat")[bot]
    P = prob.get_nodal_field(res.x, "tfmp_pres")[bot]
    h = h0 * (1 - a * res.t)
    S_exact = S0 * h0 / h
    P_exact = P0 * h0 * (1 - S0) / (h - h0 * S0)
    np.testing.assert_allclose(S, S_exact, rtol=2e-4)
    np.testing.assert_allclose(P, P_exact, rtol=2e-3)


def test_hermite_beam_bending():
    """I_H3 Hermite cubic elements (include/mm_as_const.h parity):
    clamped-clamped Euler-Bernoulli beam under uniform load — the Hermite
    FEM is nodally EXACT: w = q x^2 (L-x)^2 / (24 EI), slopes likewise."""
    from goma_tpu.physics.shell import BeamBending

    EI, q, L = 2.0, 1.5, 2.0
    mesh = rectangle_mesh(5, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.1))
    attach_shell_block(mesh, "bottom", "beam")
    # Hermite needs BAR2 (2-node) shell elements: rebuild conn from corners
    blk = mesh.blocks[-1]
    blk.elem_type = "BAR2"
    blk.conn = blk.conn[:, :2].copy()
    eqs = [[], [BeamBending(EI=EI, load=q)]]
    prob = Problem(mesh, eqs, [{}, {}])
    ends = np.array([n for n in mesh.nodesets["bottom"]
                     if abs(mesh.coords[n, 0]) < 1e-12
                     or abs(mesh.coords[n, 0] - L) < 1e-12], dtype=np.int32)
    mesh.nodesets["beam_ends"] = ends
    prob.add_dirichlet("beam_ends", "beam_w", 0, 0.0)  # clamped: w = 0
    prob.add_dirichlet("beam_ends", "beam_w", 1, 0.0)  # and w' = 0
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=3, tol_residual=1e-12,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    w = prob.get_nodal_field(res.x, "beam_w", 0)
    s = prob.get_nodal_field(res.x, "beam_w", 1)
    # only the BAR2 corner nodes carry beam dofs
    nodes = np.unique(blk.conn)
    xb = mesh.coords[nodes, 0]
    w_exact = q * xb**2 * (L - xb) ** 2 / (24 * EI)
    s_exact = q * xb * (L - xb) * (L - 2 * xb) * (-1) / (12 * EI)
    # slope of w: dw/dx = q (2x(L-x)^2 - 2x^2(L-x)) / 24EI
    s_exact = q * (2 * xb * (L - xb) ** 2 - 2 * xb**2 * (L - xb)) / (24 * EI)
    np.testing.assert_allclose(w[nodes], w_exact, atol=1e-12)
    np.testing.assert_allclose(s[nodes], s_exact, atol=1e-12)
