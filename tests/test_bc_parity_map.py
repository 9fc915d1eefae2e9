"""The BC parity map must cover every reference BC constant, and every
construct it names must actually exist (kernel entries must import; the
machinery methods must exist on Problem)."""

import importlib

import pytest

from goma_tpu.bc.catalog_map import (OVERRIDES, REF_BC_DESC, bc_parity,
                                     summary)


def test_covers_all_reference_constants():
    par = bc_parity()
    assert len(par) == len(REF_BC_DESC) == 653
    assert set(par) == set(REF_BC_DESC)
    for name, (status, construct, note) in par.items():
        assert status in ("kernel", "machinery", "n/a", "todo"), name
        if status == "kernel":
            assert construct, f"{name}: kernel entries must name a construct"


def test_no_stale_overrides():
    stale = [k for k in OVERRIDES if k not in REF_BC_DESC]
    assert not stale, stale


def _resolve(dotted: str):
    """Import the longest importable module prefix, then getattr the rest."""
    parts = dotted.split(".")
    for i in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(dotted)


def test_kernel_constructs_import():
    par = bc_parity()
    for name, (status, construct, note) in sorted(par.items()):
        if status != "kernel" or construct.startswith("Problem."):
            continue
        _resolve(construct)  # raises if the named construct is missing


def test_machinery_constructs_import():
    from goma_tpu.fem import Problem

    par = bc_parity()
    for name, (status, construct, note) in sorted(par.items()):
        if status != "machinery" or not construct:
            continue
        if construct.startswith("Problem."):
            assert hasattr(Problem, construct.split(".", 1)[1]), name
        else:
            _resolve(construct)


def test_counts_match_doc():
    """docs/BC_PARITY.md is regenerated from this map; the counts embedded
    in the doc header must match (stale doc = regenerate)."""
    cnt = summary()
    with open("docs/BC_PARITY.md") as f:
        head = f.read(2000)
    for key, label in (("kernel", "kernel"), ("machinery", "machinery"),
                       ("todo", "todo")):
        assert "| %d |" % cnt.get(key, 0) in head, (
            f"doc stale for {label}: run scripts/gen_bc_parity.py")
