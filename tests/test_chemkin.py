"""Chemkin-II mechanism parser (mm_chemkin.c closure parity)."""

import numpy as np
import pytest

from goma_tpu.physics.chemkin import parse_chemkin

MECH = """
! a toy H2 oxidation mechanism
ELEMENTS
H O
END
SPECIES
H2 O2 H2O
END
REACTIONS CAL/MOLE
2H2 + O2 => 2H2O   1.0E13  0.0  40000.0
H2 + O2 = H2O + O2   2.0E10  0.5  1000.0  ! reversible: needs K_eq
END
"""


def test_parse_chemkin_builds_network():
    # the reversible line needs K_eq
    net, species = parse_chemkin(MECH, K_eq={1: 10.0})
    assert species == ["H2", "O2", "H2O"]
    assert net.nu.shape == (2, 3)
    np.testing.assert_allclose(net.nu[0], [-2.0, -1.0, 2.0])
    np.testing.assert_allclose(net.A, [1.0e13, 2.0e10])
    np.testing.assert_allclose(net.beta, [0.0, 0.5])
    # CAL/MOLE -> J/mol
    np.testing.assert_allclose(net.Ea[0], 40000.0 * 4.184)
    assert net.K_eq[0] is None and net.K_eq[1] == 10.0
    # forward orders default to |nu| of reactants
    np.testing.assert_allclose(net.orders[0], [2.0, 1.0, 0.0])


def test_parse_chemkin_source_terms():
    """species_source from the parsed network matches hand mass-action."""
    import jax.numpy as jnp

    net, _ = parse_chemkin(
        "SPECIES\nA B C\nEND\nREACTIONS JOULES/MOLE\n"
        "A + B => C  2.0  0.0  0.0\nEND\n", T_ref=1.0)

    class FV:
        val = {"species": jnp.asarray([[0.5, 2.0, 0.0]])}

    S = np.asarray(net.species_source(FV(), {}, {}))
    r = 2.0 * 0.5 * 2.0
    np.testing.assert_allclose(S[0], [-r, -r, r], rtol=1e-12)


def test_parse_chemkin_rejects_unsupported():
    with pytest.raises(ValueError, match="reversible"):
        parse_chemkin("SPECIES\nA B\nEND\nREACTIONS\nA = B 1.0 0.0 0.0\nEND")
    with pytest.raises(ValueError, match="third-body"):
        parse_chemkin(
            "SPECIES\nA B\nEND\nREACTIONS\nA + M => B + M 1.0 0.0 0.0\nEND")
    with pytest.raises(ValueError, match="LOW"):
        parse_chemkin(
            "SPECIES\nA B\nEND\nREACTIONS\nA => B 1.0 0.0 0.0\n"
            "LOW / 1.0 0.0 0.0 /\nEND")
    with pytest.raises(ValueError, match="not declared"):
        parse_chemkin("SPECIES\nA\nEND\nREACTIONS\nA => Z 1.0 0.0 0.0\nEND")
