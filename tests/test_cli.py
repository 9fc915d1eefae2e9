"""CLI entry (python -m goma_tpu deck.json) — reference main.c parity."""

import json
import os

DECK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "decks", "cavity.json")


def test_cli_runs_example_deck(tmp_path):
    from goma_tpu.__main__ import main

    # shrink the example deck so the CLI test stays fast
    with open(DECK) as f:
        deck = json.load(f)
    deck["mesh"]["nx"] = deck["mesh"]["ny"] = 6
    deck["solver"]["max_iter"] = 10
    small = tmp_path / "cavity_small.json"
    small.write_text(json.dumps(deck))
    out = tmp_path / "out.exo"
    rc = main([str(small), "-o", str(out), "--echo"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0

    # non-convergence exits nonzero (main.c error-path parity)
    deck["solver"]["max_iter"] = 1
    deck["solver"]["tol_residual"] = 1e-14
    hard = tmp_path / "hard.json"
    hard.write_text(json.dumps(deck))
    assert main([str(hard)]) == 1
