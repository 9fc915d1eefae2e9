"""docs/DECK_REFERENCE.md stays in sync with the deck registries
(the generated analog of the reference's per-card user-manual pages)."""

import os

from goma_tpu.input import deck as deck_mod

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "DECK_REFERENCE.md")


def test_deck_reference_covers_registries():
    deck_mod._init_registry()
    deck_mod._init_face_registry()
    with open(DOC) as f:
        text = f.read()
    missing = [k for k in list(deck_mod._EQUATIONS) + list(deck_mod._FACE_KERNELS)
               if f"`{k}`" not in text]
    assert not missing, (
        f"deck types missing from docs/DECK_REFERENCE.md: {missing} — "
        "re-run python scripts/gen_deck_reference.py")


def test_deck_reference_covers_solver_options():
    import dataclasses

    from goma_tpu.solvers import NewtonOptions

    with open(DOC) as f:
        text = f.read()
    missing = [f.name for f in dataclasses.fields(NewtonOptions)
               if f"`{f.name}`" not in text]
    assert not missing, (
        f"NewtonOptions fields missing from docs/DECK_REFERENCE.md: {missing}"
        " — re-run python scripts/gen_deck_reference.py")
