"""Chemkin-II mechanism file parser feeding :class:`ReactionNetwork`.

Parity: the reference links the actual Chemkin third-party library
(``src/mm_chemkin.c`` ``chemkin_mat_prop_init``, ``ck_decide_vol_chem``)
to evaluate gas-phase mechanisms; this module reads the common subset of
the Chemkin-II input format directly — ELEMENTS / SPECIES / REACTIONS
blocks with Arrhenius lines ``A beta Ea`` — and builds the jittable
mass-action closure (`physics/kinetics.py`).

Supported:
- ``ELEMENTS``/``SPECIES``/``REACTIONS`` ... ``END`` blocks, ``!`` comments
- stoichiometric prefixes (``2H2O``), irreversible ``=>`` and reversible
  ``=`` / ``<=>`` arrows
- REACTIONS-line Ea units: CAL/MOLE (Chemkin default), KCAL/MOLE,
  JOULES/MOLE, KJOULES/MOLE, KELVINS

Not supported (raises ValueError naming the feature): third bodies
(``+M``), pressure-dependent falloff (LOW/TROE/SRI), DUPLICATE, explicit
REV parameters, and THERMO-based equilibrium constants — reversible
reactions therefore require an explicit ``K_eq`` mapping (the constant-K
closure of ReactionNetwork).
"""

from __future__ import annotations

import re

import numpy as np

from goma_tpu.physics.kinetics import ReactionNetwork

_EA_UNIT = {
    "CAL/MOLE": 4.184,
    "KCAL/MOLE": 4184.0,
    "JOULES/MOLE": 1.0,
    "KJOULES/MOLE": 1000.0,
    "KELVINS": 8.31446261815324,
}

_UNSUPPORTED = ("LOW", "TROE", "SRI", "DUPLICATE", "DUP", "REV", "PLOG",
                "FORD", "RORD")


def _strip(line: str) -> str:
    return line.split("!", 1)[0].strip()


def _parse_side(side: str, species_index: dict[str, int], rxn: str):
    """'2H2O + O2' -> {species_id: coefficient}."""
    out: dict[int, float] = {}
    for term in re.split(r"(?<![<=>])\+(?!M)", side):
        term = term.strip()
        if not term:
            continue
        if term.upper() == "M" or term.upper().endswith("(+M)"):
            raise ValueError(
                f"chemkin: third-body (+M) reactions not supported: {rxn!r}")
        m = re.match(r"^(\d+(?:\.\d+)?)?\s*(.+)$", term)
        coef = float(m.group(1)) if m.group(1) else 1.0
        name = m.group(2).strip()
        if name not in species_index:
            raise ValueError(f"chemkin: species {name!r} in reaction "
                             f"{rxn!r} not declared in SPECIES block")
        sid = species_index[name]
        out[sid] = out.get(sid, 0.0) + coef
    return out


def parse_chemkin(text: str, K_eq: dict[int, float] | None = None,
                  dH: dict[int, float] | None = None, T_ref=None):
    """Parse a Chemkin-II mechanism string.

    Returns ``(network, species)`` — a :class:`ReactionNetwork` (Ea in
    J/mol, concentrations in the deck's own units) and the SPECIES-block
    name list defining the species ordering. ``K_eq[j]`` supplies the
    equilibrium constant of the j-th reaction when it is written
    reversible; ``dH[j]`` the molar heat of reaction.
    """
    lines = [_strip(l) for l in text.splitlines()]
    species: list[str] = []
    rxn_lines: list[str] = []
    ea_scale = _EA_UNIT["CAL/MOLE"]
    block = None
    for ln in lines:
        if not ln:
            continue
        up = ln.upper()
        head = up.split()[0]
        if head in ("ELEMENTS", "ELEM"):
            block = "elements"
            continue
        if head in ("SPECIES", "SPEC"):
            block = "species"
            species.extend(ln.split()[1:])
            continue
        if head in ("REACTIONS", "REAC"):
            block = "reactions"
            for tok in up.split()[1:]:
                if tok in _EA_UNIT:
                    ea_scale = _EA_UNIT[tok]
            continue
        if head == "THERMO":
            block = "thermo"
            continue
        if up == "END":
            block = None
            continue
        if block == "species":
            species.extend(ln.split())
        elif block == "reactions":
            rxn_lines.append(ln)

    sidx = {s: i for i, s in enumerate(species)}
    ns = len(species)
    nu, A, beta, Ea, rev = [], [], [], [], []
    for ln in rxn_lines:
        up = ln.upper()
        for kw in _UNSUPPORTED:
            if re.search(rf"\b{kw}\b", up):
                raise ValueError(f"chemkin: {kw} not supported: {ln!r}")
        parts = ln.split()
        if len(parts) < 4:
            raise ValueError(f"chemkin: expected 'rxn A beta Ea': {ln!r}")
        a, b, ea = (float(parts[-3]), float(parts[-2]), float(parts[-1]))
        rxn = " ".join(parts[:-3])
        m = re.split(r"<=>|=>|=", rxn)
        if len(m) != 2:
            raise ValueError(f"chemkin: cannot parse reaction {rxn!r}")
        irreversible = "=>" in rxn and "<=>" not in rxn
        lhs = _parse_side(m[0], sidx, rxn)
        rhs = _parse_side(m[1], sidx, rxn)
        row = np.zeros(ns)
        for sid, c in lhs.items():
            row[sid] -= c
        for sid, c in rhs.items():
            row[sid] += c
        nu.append(row)
        A.append(a)
        beta.append(b)
        Ea.append(ea * ea_scale)
        rev.append(not irreversible)

    K = [None] * len(nu)
    for j, r in enumerate(rev):
        if r:
            if K_eq is None or j not in K_eq:
                raise ValueError(
                    f"chemkin: reaction {j} is reversible; supply K_eq[{j}] "
                    "(THERMO-based equilibrium is not implemented)")
            K[j] = K_eq[j]
    dh = np.zeros(len(nu))
    if dH:
        for j, v in dH.items():
            dh[j] = v
    net = ReactionNetwork(nu=np.asarray(nu), A=A, beta=beta, Ea=Ea,
                          K_eq=K, dH=dh, T_ref=T_ref)
    return net, species


def read_chemkin(path: str, **kw):
    """File variant of :func:`parse_chemkin`."""
    with open(path) as f:
        return parse_chemkin(f.read(), **kw)
