"""Deck (declarative input system) tests: the lid-driven cavity as a deck,
transient heat as a deck with Exodus output."""

import numpy as np

from goma_tpu.input.deck import build_problem, run_deck


def test_cavity_deck():
    deck = {
        "mesh": {"kind": "rectangle", "nx": 8, "ny": 8, "elem": "QUAD9"},
        "equations": [
            {"type": "momentum", "dim": 2, "interp": "Q2", "transient": False},
            {"type": "continuity", "interp": "Q1"},
        ],
        "material": {"rho": 1.0, "mu": 0.01},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity", "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity", "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity", "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity", "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity", "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity", "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity", "comp": 0, "value": 1.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity", "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity", "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity", "comp": 0, "value": 0.0},
            {"kind": "pin", "var": "pressure", "value": 0.0},
        ],
        "solver": {"max_iter": 10, "tol_residual": 1e-9, "linear_tol": 1e-10,
                   "gmres_restart": 80, "linear_maxiter": 2000},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged, res.summary()
    assert echo["resolved"]["n_dof"] == prob.dofmap.n_dof
    assert echo["resolved"]["variables"] == [("velocity", 2), ("pressure", 1)]


def test_transient_heat_deck_with_output(tmp_path):
    out = str(tmp_path / "heat.exo")
    deck = {
        "mesh": {"kind": "rectangle", "nx": 5, "ny": 5, "elem": "QUAD9"},
        "equations": [
            {"type": "energy", "interp": "Q2", "transient": True, "convection": False}
        ],
        "material": {"rho": 1.0, "Cp": 1.0, "k": 1.0},
        "bcs": [
            {"kind": "dirichlet", "nodeset": ns, "var": "temperature", "value": 0.0}
            for ns in ("left", "right", "top", "bottom")
        ],
        "initial": [
            {"var": "temperature",
             "value": (lambda c: np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))}
        ],
        "solver": {"max_iter": 6, "tol_residual": 1e-10, "linear_tol": 1e-11},
        "time": {"dt0": 0.01, "t_end": 0.05, "theta": 0.5, "adapt": False},
        "output": {"exodus": out},
    }
    prob, res, echo = run_deck(deck)
    assert res.t == 0.05
    # output readable
    from goma_tpu.io import read_exodus

    m2, fields, _ = read_exodus(out)
    assert "temperature" in fields
    lam = 2 * np.pi**2
    exact_mid = np.exp(-lam * 0.05) * 1.0
    mid = np.argmin(np.sum((m2.coords - 0.5) ** 2, axis=1))
    np.testing.assert_allclose(fields["temperature"][0][mid], exact_mid, rtol=2e-2)


def test_deck_navier_slip_couette():
    """New BC-catalog cards through the declarative deck: Navier slip wall,
    exact slip-Couette profile u(y) = U (y + Ls)/(H + Ls)."""
    import numpy as np
    from goma_tpu.input.deck import run_deck

    U, mu, beta, H = 1.0, 0.5, 2.0, 1.0
    Ls = mu * beta
    deck = {
        "mesh": {"kind": "rectangle", "nx": 3, "ny": 6, "elem": "QUAD9",
                 "xlim": (0, 0.5), "ylim": (0, H)},
        "equations": [
            {"type": "momentum", "dim": 2, "interp": "Q2", "transient": False},
            {"type": "continuity", "interp": "Q1"},
        ],
        "material": {"rho": 1.0, "mu": mu},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 0, "value": U},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "face", "sideset": "bottom", "type": "navier_slip",
             "args": {"dim": 2, "beta": beta}},
            {"kind": "pin", "var": "pressure", "value": 0.0},
        ],
        "solver": {"max_iter": 8, "tol_residual": 1e-10,
                   "linear_solver": "direct"},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged
    ux = prob.get_nodal_field(res.x, "velocity", 0)
    y = prob.mesh.coords[:, 1]
    exact = U * (y + Ls) / (H + Ls)
    mask = ~np.isnan(ux)
    np.testing.assert_allclose(ux[mask], exact[mask], atol=1e-8)


def test_deck_expression_preprocessing():
    """Aprepro-equivalent (src/util/aprepro_helper.cpp parity): "expr:"
    strings in JSON-able decks evaluate before building."""
    import numpy as np
    from goma_tpu.input.deck import run_deck

    deck = {
        "mesh": {"kind": "rectangle", "nx": 4, "ny": 4, "elem": "QUAD9",
                 "xlim": (0, "expr: 2*pi/6.283185307179586"), "ylim": (0, 1)},
        "equations": [{"type": "energy", "interp": "Q2", "transient": False,
                       "convection": False}],
        "material": {"k": "expr: sqrt(4.0)"},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "left", "var": "temperature",
             "value": "expr: exp(0.0)"},
            {"kind": "dirichlet", "nodeset": "right", "var": "temperature",
             "value": 0.0},
        ],
        "solver": {"max_iter": 4, "tol_residual": 1e-11,
                   "linear_solver": "direct"},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged
    T = prob.get_nodal_field(res.x, "temperature", 0)
    x = prob.mesh.coords[:, 0]
    np.testing.assert_allclose(T, 1.0 - x, atol=1e-10)  # k uniform -> linear


def test_deck_overset_cylinder():
    """Overset through the deck: immersed circle + multiplier block +
    overset section reproduce the fictitious-domain cylinder flow."""
    import numpy as np
    from goma_tpu.input.deck import run_deck

    deck = {
        "mesh": {"kind": "rectangle", "nx": 12, "ny": 6, "elem": "QUAD9",
                 "xlim": (0, 2.0), "ylim": (0, 1.0)},
        "immersed": [{"kind": "circle", "center": (0.7, 0.5),
                      "radius": 0.22, "n": 20, "name": "cyl"}],
        "equations": [
            [{"type": "momentum", "dim": 2, "interp": "Q2",
              "transient": False, "convection": False},
             {"type": "continuity", "interp": "Q1"}],
            [{"type": "overset_lm", "dim": 2}],
        ],
        "material": [{"rho": 1.0, "mu": 1.0}, {}],
        "overset": [{"bar_block": "cyl", "fluid_block": 0,
                     "kernel": {"type": "no_slip", "dim": 2}}],
        "bcs": [
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity",
             "comp": 0, "value": 1.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity",
             "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "pin", "var": "pressure", "value": 0.0},
        ],
        "solver": {"max_iter": 8, "tol_residual": 1e-9,
                   "linear_solver": "direct"},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged
    from goma_tpu.post.particles import FieldSampler

    u = FieldSampler(prob).sample(res.x, "velocity",
                                  np.array([[0.7, 0.5 + 0.22]]))
    assert abs(u[0, 0]) < 0.05  # no-slip held at the immersed boundary


def test_deck_gd_parabolic_inflow():
    """GD_PARAB-style deck value: a {"gd": [...]} dict on a Dirichlet card
    builds a parabolic inflow profile (reference GD_* cards,
    src/mm_input_bc.c rd_bc_specs GD branch / bc_colloc.c). The Stokes
    channel then reproduces the exact Poiseuille solution everywhere."""
    U = 1.5
    deck = {
        "mesh": {"kind": "rectangle", "nx": 10, "ny": 5, "elem": "QUAD9",
                 "xlim": [0.0, 2.0], "ylim": [0.0, 1.0]},
        "equations": [
            {"type": "momentum", "dim": 2, "interp": "Q2",
             "transient": False, "convection": False},
            {"type": "continuity", "interp": "Q1"},
        ],
        "material": {"rho": 1.0, "mu": 1.0},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity",
             "comp": 0,
             "value": {"gd": [{"fn": "parab", "var": "y",
                               "c": [0.0, 4.0 * U, -4.0 * U]}]}},
            {"kind": "dirichlet", "nodeset": "left", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity",
             "comp": 0,
             "value": {"gd": [{"fn": "poly", "var": "y",
                               "c": [0.0, 4.0 * U, -4.0 * U]}]}},
            {"kind": "dirichlet", "nodeset": "right", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "top", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity",
             "comp": 0, "value": 0.0},
            {"kind": "dirichlet", "nodeset": "bottom", "var": "velocity",
             "comp": 1, "value": 0.0},
            {"kind": "pin", "var": "pressure", "value": 0.0},
        ],
        "solver": {"max_iter": 6, "tol_residual": 1e-10,
                   "linear_tol": 1e-12, "linear_maxiter": 3000},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged
    u = prob.get_nodal_field(res.x, "velocity", 0)
    y = prob.mesh.coords[:, 1]
    np.testing.assert_allclose(u, 4 * U * y * (1 - y), atol=2e-8)


def test_deck_gd_time_table_transient():
    """Time-table GD value ({"table": ...} over var "time"): a transient
    heat deck whose wall temperature ramps along the table — the solved
    boundary dof follows the table value at each step (TABLE_WICV /
    GD_TIME table parity)."""
    deck = {
        "mesh": {"kind": "rectangle", "nx": 4, "ny": 4, "elem": "QUAD4"},
        "equations": [{"type": "energy", "interp": "Q1", "transient": True}],
        "material": {"rho": 1.0, "Cp": 1.0, "k": 1.0},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "left", "var": "temperature",
             "comp": 0,
             "value": {"table": {"var": "time",
                                 "points": [[0.0, 0.0], [0.1, 1.0],
                                            [0.2, 1.0]]}}},
            {"kind": "dirichlet", "nodeset": "right", "var": "temperature",
             "comp": 0, "value": 0.0},
        ],
        "time": {"dt0": 0.05, "t_end": 0.1, "adapt": False},
        "solver": {"max_iter": 8, "tol_residual": 1e-11},
    }
    prob, res, echo = run_deck(deck)
    T = prob.get_nodal_field(res.x, "temperature", 0)
    left = prob.mesh.nodesets["left"]
    # at t_end = 0.1 the table gives exactly 1.0 on the left wall
    np.testing.assert_allclose(T[left], 1.0, atol=1e-9)


def test_deck_gd_factor_product_and_validation():
    """GD factors multiply (profile x time ramp), and malformed specs
    raise named errors."""
    import jax.numpy as jnp
    import pytest

    from goma_tpu.input.deck import build_gd_value

    fn = build_gd_value({"gd": [
        {"fn": "linear", "var": "x", "c": [0.0, 2.0]},
        {"fn": "sin", "var": "time", "c": [0.0, 3.0, 0.5]},
    ]})
    coords = jnp.asarray([[1.0, 0.0], [2.0, 0.0]])
    v = np.asarray(fn(coords, {"time": jnp.asarray(0.7)}))
    np.testing.assert_allclose(
        v, [2.0 * 3.0 * np.sin(0.35), 4.0 * 3.0 * np.sin(0.35)], rtol=1e-6)
    # exp factor
    fe = build_gd_value({"gd": [{"fn": "exp", "var": "y", "c": [1.0, 2.0, -3.0]}]})
    ve = np.asarray(fe(coords, {}))
    np.testing.assert_allclose(ve, 1.0 + 2.0 * np.exp(-3.0 * 0.0), rtol=1e-6)
    # table clamping outside the range
    ft = build_gd_value({"table": {"var": "x",
                                   "points": [[0.0, 5.0], [1.0, 7.0]]}})
    vt = np.asarray(ft(jnp.asarray([[-1.0, 0.0], [0.5, 0.0], [9.0, 0.0]]), {}))
    np.testing.assert_allclose(vt, [5.0, 6.0, 7.0], rtol=1e-6)
    with pytest.raises(ValueError, match="unknown gd factor fn"):
        build_gd_value({"gd": [{"fn": "nope", "var": "x"}]})
    with pytest.raises(ValueError, match="increasing"):
        build_gd_value({"table": {"var": "x", "points": [[1, 0], [0, 1]]}})


def test_deck_edge_and_rotated_bcs():
    """Deck kinds "edge" (bc_curve.c cards: CA_EDGE on a sideset
    intersection) and "rotated" (strong n.q constraint): the contact-angle
    box from tests/test_ca_edge_porous.py expressed declaratively."""
    theta = float(np.deg2rad(70.0))
    deck = {
        "mesh": {"kind": "box", "nx": 3, "ny": 3, "nz": 2, "elem": "HEX8",
                 "zlim": [0.0, 0.5]},
        "equations": [{"type": "mesh_elliptic", "dim": 3, "interp": "Q1"}],
        "material": {},
        "bcs": [
            {"kind": "dirichlet", "nodeset": "bottom",
             "var": "mesh_displacement", "comp": c, "value": 0.0}
            for c in range(3)
        ] + [
            {"kind": "dirichlet", "nodeset": ns, "var": "mesh_displacement",
             "comp": 0, "value": 0.0} for ns in ("left", "right")
        ] + [
            {"kind": "dirichlet", "nodeset": ns, "var": "mesh_displacement",
             "comp": 1, "value": 0.0} for ns in ("front", "back")
        ] + [
            {"kind": "edge", "sideset_a": "top", "sideset_b": "right",
             "type": "ca_edge", "args": {"theta": theta, "penalty": 1e4}},
        ],
        "solver": {"max_iter": 30, "tol_residual": 1e-9,
                   "linear_solver": "direct"},
    }
    prob, res, echo = run_deck(deck)
    assert res.converged, res.summary()
    from test_ca_edge_porous import _edge_fs_dot

    dots, _ = _edge_fs_dot(prob, res.x)
    np.testing.assert_allclose(dots, np.cos(theta), atol=2e-2)

    # rotated kind: strong no-penetration on a tilted lid via deck
    deck2 = {
        "mesh": {"kind": "rectangle", "nx": 4, "ny": 4, "elem": "QUAD9"},
        "equations": [
            {"type": "momentum", "dim": 2, "transient": False},
            {"type": "continuity", "interp": "Q1"},
        ],
        "material": {"rho": 1.0, "mu": 1.0},
        "bcs": [
            {"kind": "dirichlet", "nodeset": ns, "var": "velocity",
             "comp": c, "value": 0.0}
            for ns in ("left", "right", "bottom") for c in range(2)
        ] + [
            {"kind": "rotated", "sideset": "top", "var": "velocity",
             "direction": "normal", "value": 0.0},
            {"kind": "pin", "var": "pressure", "value": 0.0},
        ],
        "solver": {"max_iter": 10, "tol_residual": 1e-10,
                   "linear_solver": "direct"},
    }
    prob2, res2, _ = run_deck(deck2)
    assert res2.converged
    dm = prob2.dofmap
    uy = np.asarray(res2.x)[dm.dof_of_node_svar[
        prob2.mesh.nodesets["top"], dm.svar("velocity", 1)]]
    np.testing.assert_allclose(uy, 0.0, atol=1e-8)
