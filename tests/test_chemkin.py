"""Chemkin-II mechanism parser (mm_chemkin.c closure parity): base
mass-action subset plus third bodies, falloff (LOW/TROE/SRI), REV,
DUPLICATE, PLOG, and THERMO (NASA-7) equilibrium constants."""

import numpy as np
import pytest

from goma_tpu.physics.chemkin import parse_chemkin
from goma_tpu.physics.kinetics import GAS_R, Nasa7, _UNITS

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


class FV:
    def __init__(self, c, T=None):
        import jax.numpy as jnp

        self.val = {"species": jnp.asarray(c, dtype=float)}
        if T is not None:
            self.val["temperature"] = jnp.asarray(T, dtype=float).reshape(-1, 1)


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
    net, _ = parse_chemkin(
        "SPECIES\nA B C\nEND\nREACTIONS JOULES/MOLE\n"
        "A + B => C  2.0  0.0  0.0\nEND\n", T_ref=1.0)
    S = np.asarray(net.species_source(FV([[0.5, 2.0, 0.0]]), {}, {}))
    r = 2.0 * 0.5 * 2.0
    np.testing.assert_allclose(S[0], [-r, -r, r], rtol=1e-12)


def test_parse_chemkin_rejects_unsupported():
    with pytest.raises(ValueError, match="reversible"):
        parse_chemkin("SPECIES\nA B\nEND\nREACTIONS\nA = B 1.0 0.0 0.0\nEND")
    with pytest.raises(ValueError, match="LOW"):
        # LOW is only meaningful after a (+M) falloff reaction
        parse_chemkin(
            "SPECIES\nA B\nEND\nREACTIONS\nA => B 1.0 0.0 0.0\n"
            "LOW / 1.0 0.0 0.0 /\nEND")
    with pytest.raises(ValueError, match="FORD"):
        parse_chemkin(
            "SPECIES\nA B\nEND\nREACTIONS\nA => B 1.0 0.0 0.0\n"
            "FORD / A 1.5 /\nEND")
    with pytest.raises(ValueError, match="not declared"):
        parse_chemkin("SPECIES\nA\nEND\nREACTIONS\nA => Z 1.0 0.0 0.0\nEND")


def test_third_body_with_efficiencies():
    """+M multiplies the rate by [M] = sum_k eff_k c_k (both directions)."""
    net, _ = parse_chemkin(
        "SPECIES\nA B AR H2O\nEND\nREACTIONS JOULES/MOLE\n"
        "A + M => B + M  3.0  0.0  0.0\n"
        "H2O/6.0/ AR/0.5/\nEND\n", T_ref=1.0)
    assert net.third_body[0] is not None
    c = [[2.0, 0.0, 1.0, 0.25]]
    M = 2.0 + 0.0 + 0.5 * 1.0 + 6.0 * 0.25
    S = np.asarray(net.species_source(FV(c), {}, {}))
    np.testing.assert_allclose(S[0][:2], [-3.0 * 2.0 * M, 3.0 * 2.0 * M],
                               rtol=1e-12)


def test_falloff_lindemann():
    """(+M) with only LOW: k = k_inf Pr/(1+Pr), Pr = k0 [M]/k_inf."""
    net, _ = parse_chemkin(
        "SPECIES\nA B\nEND\nREACTIONS JOULES/MOLE\n"
        "A (+M) => B (+M)  10.0  0.0  0.0\n"
        "LOW / 4.0 0.0 0.0 /\nEND\n", T_ref=300.0)
    cA = 2.0
    M = cA  # only A present
    Pr = 4.0 * M / 10.0
    k = 10.0 * Pr / (1.0 + Pr)
    S = np.asarray(net.species_source(FV([[cA, 0.0]]), {}, {}))
    np.testing.assert_allclose(S[0], [-k * cA, k * cA], rtol=1e-12)


def test_falloff_troe():
    """TROE blending matches the hand-evaluated F at one (T, Pr) point."""
    T = 1200.0
    net, _ = parse_chemkin(
        "SPECIES\nA B\nEND\nREACTIONS JOULES/MOLE\n"
        "A (+M) <=> B (+M)  1.0e3  0.0  0.0\n"
        "LOW / 5.0e2 0.0 0.0 /\n"
        "TROE / 0.6 100.0 2000.0 /\nEND\n", K_eq={0: 1e30}, T_ref=T)
    cA = 0.01
    k_inf, k0 = 1.0e3, 5.0e2
    Pr = k0 * cA / k_inf
    Fc = 0.4 * np.exp(-T / 100.0) + 0.6 * np.exp(-T / 2000.0)
    lFc = np.log10(Fc)
    cc, nn = -0.4 - 0.67 * lFc, 0.75 - 1.27 * lFc
    lpr = np.log10(Pr) + cc
    F = 10.0 ** (lFc / (1.0 + (lpr / (nn - 0.14 * lpr)) ** 2))
    k = k_inf * Pr / (1 + Pr) * F
    S = np.asarray(net.species_source(FV([[cA, 0.0]]), {}, {}))
    np.testing.assert_allclose(S[0][0], -k * cA, rtol=1e-10)


def test_falloff_sri_and_specific_collider():
    """SRI blending with a named collider (+AR): [M] = c_AR."""
    T = 800.0
    net, _ = parse_chemkin(
        "SPECIES\nA B AR\nEND\nREACTIONS JOULES/MOLE\n"
        "A (+AR) => B (+AR)  2.0e3  0.0  0.0\n"
        "LOW / 1.0e3 0.0 0.0 /\n"
        "SRI / 0.5 300.0 1000.0 /\nEND\n", T_ref=T)
    cA, cAR = 0.3, 0.05
    k_inf, k0 = 2.0e3, 1.0e3
    Pr = k0 * cAR / k_inf
    X = 1.0 / (1.0 + np.log10(Pr) ** 2)
    F = (0.5 * np.exp(-300.0 / T) + np.exp(-T / 1000.0)) ** X
    k = k_inf * Pr / (1 + Pr) * F
    S = np.asarray(net.species_source(FV([[cA, 0.0, cAR]]), {}, {}))
    np.testing.assert_allclose(S[0][0], -k * cA, rtol=1e-10)


def test_rev_card_and_duplicate():
    """REV gives an independent reverse Arrhenius; DUP rows add."""
    net, _ = parse_chemkin(
        "SPECIES\nA B\nEND\nREACTIONS JOULES/MOLE\n"
        "A = B  5.0  0.0  0.0\n"
        "REV / 2.0 0.0 0.0 /\n"
        "DUPLICATE\n"
        "A = B  1.0  0.0  0.0\n"
        "REV / 0.5 0.0 0.0 /\n"
        "DUP\nEND\n", T_ref=1.0)
    cA, cB = 3.0, 4.0
    r = (5.0 + 1.0) * cA - (2.0 + 0.5) * cB
    S = np.asarray(net.species_source(FV([[cA, cB]]), {}, {}))
    np.testing.assert_allclose(S[0], [-r, r], rtol=1e-12)


def test_plog_interpolation():
    """PLOG: ln k linear in ln P between bracketing pressures."""
    mech = ("SPECIES\nA B\nEND\nREACTIONS JOULES/MOLE\n"
            "A => B  1.0  0.0  0.0\n"
            "PLOG / 1.0   10.0  0.0  0.0 /\n"
            "PLOG / 100.0 1000.0 0.0 0.0 /\nEND\n")
    # geometric midpoint P=10 -> k = sqrt(10*1000) = 100
    net, _ = parse_chemkin(mech, T_ref=1.0, pressure=10.0)
    S = np.asarray(net.species_source(FV([[1.0, 0.0]]), {}, {}))
    np.testing.assert_allclose(S[0][0], -100.0, rtol=1e-10)
    # clamped below/above the table
    net_lo, _ = parse_chemkin(mech, T_ref=1.0, pressure=0.01)
    np.testing.assert_allclose(
        np.asarray(net_lo.species_source(FV([[1.0, 0.0]]), {}, {}))[0][0],
        -10.0, rtol=1e-10)


def _nasa_line(name, Tlo, Thi, Tmid, a_high, a_low):
    """Format a 4-line fixed-column NASA-7 THERMO record."""
    l1 = f"{name:<18}{'':6}{'':20}G{Tlo:10.2f}{Thi:10.2f}{Tmid:8.2f}{'':6}1"
    fields = list(a_high) + list(a_low)
    l2 = "".join(f"{v: 15.8E}" for v in fields[0:5]) + "    2"
    l3 = "".join(f"{v: 15.8E}" for v in fields[5:10]) + "    3"
    l4 = "".join(f"{v: 15.8E}" for v in fields[10:14]) + "                   4"
    return "\n".join([l1, l2, l3, l4])


def test_thermo_equilibrium_constant():
    """THERMO-based K_eq: net rate vanishes at c_B/c_A = Kc(T).

    Synthetic NASA-7 sets with only a6 (enthalpy) and a7 (entropy)
    nonzero give Kp = exp(da7 - da6/T) exactly; dnu = 0 so Kc = Kp.
    """
    T = 500.0
    a6_A, a7_A, a6_B, a7_B = 100.0, 2.0, -50.0, 3.5
    zeros = [0.0] * 5
    recA = _nasa_line("A", 200.0, 3000.0, 1000.0,
                      zeros + [a6_A, a7_A], zeros + [a6_A, a7_A])
    recB = _nasa_line("B", 200.0, 3000.0, 1000.0,
                      zeros + [a6_B, a7_B], zeros + [a6_B, a7_B])
    mech = ("SPECIES\nA B\nEND\nTHERMO\n" + recA + "\n" + recB +
            "\nEND\nREACTIONS JOULES/MOLE\nA = B  7.0  0.0  0.0\nEND\n")
    net, _ = parse_chemkin(mech, T_ref=T, units="si")
    assert net.K_eq[0] == "thermo"
    Kc = np.exp((a7_B - a7_A) - (a6_B - a6_A) / T)
    cA = 0.2
    S = np.asarray(net.species_source(FV([[cA, Kc * cA]]), {}, {}))
    np.testing.assert_allclose(S[0], [0.0, 0.0], atol=1e-10 * 7.0 * cA)
    # off equilibrium the net rate has the right value and sign
    S2 = np.asarray(net.species_source(FV([[cA, 2 * Kc * cA]]), {}, {}))
    np.testing.assert_allclose(S2[0][0], 7.0 * cA, rtol=1e-10)


def test_thermo_kc_dnu_units():
    """Kc carries (P_atm/RT)^dnu in the chosen unit system (A => 2B)."""
    T = 400.0
    zeros = [0.0] * 5
    rec = [_nasa_line(n, 200.0, 3000.0, 1000.0, zeros + [0.0, 0.0],
                      zeros + [0.0, 0.0]) for n in ("A", "B")]
    mech = ("SPECIES\nA B\nEND\nTHERMO\n" + "\n".join(rec) +
            "\nEND\nREACTIONS JOULES/MOLE\nA = 2B  1.0  0.0  0.0\nEND\n")
    for units in ("si", "cgs"):
        net, _ = parse_chemkin(mech, T_ref=T, units=units)
        R_u, P_atm = _UNITS[units]
        Kc = P_atm / (R_u * T)  # Kp = 1, dnu = +1
        cA = 0.7
        cB = np.sqrt(Kc * cA)  # c_B^2/c_A = Kc -> equilibrium
        S = np.asarray(net.species_source(FV([[cA, cB]]), {}, {}))
        np.testing.assert_allclose(S[0], [0.0, 0.0], atol=1e-9 * cA)


def test_reversible_falls_back_rev_then_thermo():
    """Resolution order: explicit K_eq > REV > THERMO."""
    zeros = [0.0] * 5
    rec = [_nasa_line(n, 200.0, 3000.0, 1000.0, zeros + [0.0, 1.0],
                      zeros + [0.0, 1.0]) for n in ("A", "B")]
    mech = ("SPECIES\nA B\nEND\nTHERMO\n" + "\n".join(rec) +
            "\nEND\nREACTIONS JOULES/MOLE\n"
            "A = B  1.0  0.0  0.0\nREV / 4.0 0.0 0.0 /\nEND\n")
    net, _ = parse_chemkin(mech, T_ref=1.0)
    # REV wins over thermo: r = k_f c_A - 4 c_B
    S = np.asarray(net.species_source(FV([[1.0, 1.0]]), {}, {}))
    np.testing.assert_allclose(S[0][0], -(1.0 - 4.0), rtol=1e-12)
    net2, _ = parse_chemkin(mech, K_eq={0: 0.5}, T_ref=1.0)
    assert net2.K_eq[0] == 0.5


def test_network_jacobian_is_ad_clean():
    """The closure differentiates cleanly (jacfwd over concentrations)."""
    import jax
    import jax.numpy as jnp

    net, _ = parse_chemkin(
        "SPECIES\nA B C\nEND\nREACTIONS JOULES/MOLE\n"
        "A + B (+M) <=> C (+M)  1.0e2  0.2  500.0\n"
        "LOW / 50.0 0.0 100.0 /\nTROE / 0.7 200.0 1500.0 /\nEND\n",
        K_eq={0: 3.0})

    def src(c):
        return net.species_source(FV(c.reshape(1, 3), T=[700.0]), {}, {})[0]

    J = jax.jacfwd(src)(jnp.asarray([0.4, 0.3, 0.2]))
    assert np.all(np.isfinite(np.asarray(J)))
    # FD cross-check
    eps = 1e-6
    c0 = np.array([0.4, 0.3, 0.2])
    for k in range(3):
        cp, cm = c0.copy(), c0.copy()
        cp[k] += eps
        cm[k] -= eps
        fd = (np.asarray(src(jnp.asarray(cp)))
              - np.asarray(src(jnp.asarray(cm)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, k], fd,
                                   rtol=2e-4, atol=1e-7)
