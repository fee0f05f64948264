"""D4 symmetry parity (tak/tests/symm.rs).

Plays the same seeded game under all 8 symmetries simultaneously via the
precomputed action permutation and asserts all games end identically.
"""

import numpy as np
import pytest

from tak_tpu.game import Game
from tak_tpu.types import ONGOING

SEEDS = [
    5915587277, 1500450271, 3267000013, 5754853343, 4093082899,
    9576890767, 3628273133, 2860486313, 5463458053, 3367900313,
]


@pytest.mark.parametrize("seed", SEEDS)
def test_symmetrical_boards(seed):
    games = [Game(5) for _ in range(8)]
    sym = np.asarray(games[0].engine.tables.sym_action)
    while games[0].result == ONGOING:
        acts = games[0].legal_actions()
        a = int(acts[seed % len(acts)])
        for i, g in enumerate(games):
            g.play_action(int(sym[i, a]))  # checked: transformed move legal
    results = [g.result for g in games]
    assert len(set(results)) == 1, results


def test_symmetry_masks_match():
    """Legal mask commutes with the symmetry permutation mid-game."""
    moves = ["d3", "c3", "c4", "1d3<", "1c4-", "Sc4", "Cc2", "b4"]
    base = Game.from_ptn_moves(5, moves)
    sym = np.asarray(base.engine.tables.sym_action)
    mask0 = base.legal_mask()
    for i in range(8):
        g = Game(5)
        for m in moves:
            a = g.engine.tables.ptn_to_action(m)
            g.play_action(int(sym[i, a]))
        mask_i = g.legal_mask()
        assert (mask_i[sym[i]] == mask0).all(), i
