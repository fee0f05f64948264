"""Differential testing: JAX engine vs native C++ oracle.

BASELINE.json config 1: exact trajectory parity under fixed seeds between
the vectorized TPU engine and an independent rules implementation.  Both
engines enumerate legal actions in the reference's possible_moves order,
so `seed % count` playouts must agree move-for-move, and every
intermediate position must agree on legality, result, reserves, and
board contents.
"""

import numpy as np
import pytest

from tak_tpu.game import Game
from tak_tpu.types import ONGOING

native = pytest.importorskip("tak_tpu.native")
if not native.available():
    pytest.skip("takcore native library unavailable", allow_module_level=True)

SEEDS = [5915587277, 1500450271, 3267000013, 4093082899, 2860486313]


@pytest.mark.parametrize("n", [5, 6])
@pytest.mark.parametrize("seed", SEEDS)
def test_seeded_playout_parity(n, seed):
    jax_game = Game(n)
    nat_game = native.NativeGame(n)
    ply = 0
    while jax_game.result == ONGOING and ply < 500:
        jax_acts = jax_game.legal_actions()
        nat_acts = nat_game.legal_actions()
        assert np.array_equal(jax_acts, nat_acts), f"ply {ply}"
        a = int(jax_acts[seed % len(jax_acts)])
        jax_game.play_action(a, check=False)
        nat_game.play_action(a)
        assert jax_game.result == nat_game.result, f"ply {ply} action {a}"
        assert (int(jax_game.state.stones[0]), int(jax_game.state.caps[0]),
                int(jax_game.state.stones[1]), int(jax_game.state.caps[1])) \
            == nat_game.reserves(), f"ply {ply}"
        ply += 1
    assert nat_game.result == jax_game.result


def test_board_contents_parity():
    """Deep-stack position: every stack color level must agree."""
    moves = ["c4", "c2", "d2", "c3", "b2", "d3", "1d2+", "b3", "d2", "b4",
             "1c2+", "1b3>", "2d3<", "1c4-", "d4", "5c3<23", "c2", "c4"]
    jax_game = Game.from_ptn_moves(5, moves)
    nat_game = native.NativeGame(5)
    for m in moves:
        a = jax_game.engine.tables.ptn_to_action(m)
        nat_game.play_action(a)
    heights, tops, colors = nat_game.board_arrays()
    assert np.array_equal(np.asarray(jax_game.state.heights), heights)
    assert np.array_equal(np.asarray(jax_game.state.tops), tops)
    stacks = np.asarray(jax_game.state.stacks)
    for s in range(25):
        for h in range(heights[s]):
            jax_bit = (int(stacks[s, h // 32]) >> (h % 32)) & 1
            assert jax_bit == colors[s][h], (s, h)


@pytest.mark.slow
def test_native_perft6_depth5():
    """The oracle the reference leaves commented out (perft.rs:97)."""
    g = native.NativeGame(6)
    assert g.perft(5) == 1_253_506_520
