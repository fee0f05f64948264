"""Instant-win scan correctness (self_play.rs:119-137 capability)."""

import jax
import numpy as np

from tak_tpu.game import Game
from tak_tpu.types import ONGOING, result_winner


def _brute_force_wins(game):
    """Reference semantics: try every legal move, keep mover's wins."""
    wins = np.zeros(game.engine.num_actions, bool)
    for a in game.legal_actions():
        clone = game.clone()
        clone.play_action(int(a), check=False)
        w = int(result_winner(clone.state.result))
        if w == game.to_move:
            wins[a] = True
    return wins


def test_win_in_one_road():
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    wins = np.asarray(g.engine.wins_in_one(g.state))
    brute = _brute_force_wins(g)
    assert np.array_equal(wins, brute)
    assert wins.sum() >= 1  # c1 completes the white road
    assert wins[g.engine.tables.ptn_to_action("c1")]


def test_no_win_available():
    g = Game.from_ptn_moves(5, ["a1", "e5", "c3"])
    wins = np.asarray(g.engine.wins_in_one(g.state))
    assert not wins.any()


def test_flat_count_win_detected():
    # filling the last square triggers a flat-count result for the mover
    g = Game.from_ptn_moves(3, ["a3", "c1", "c2", "c3", "b3", "b2", "b1",
                                "a1"])
    assert g.result == ONGOING
    wins = np.asarray(g.engine.wins_in_one(g.state))
    brute = _brute_force_wins(g)
    assert np.array_equal(wins, brute)
    # white places a2 -> board full, white up on flats (wins.rs:17-24)
    assert wins[g.engine.tables.ptn_to_action("a2")]


def test_fused_wins_scan_parity():
    """wins_in_one_fused_fn (one fused-step-kernel launch over all
    (game, action) pairs) == vmapped wins_in_one, exactly."""
    import jax.numpy as jnp

    from tak_tpu.engine.core import get_engine

    engine = get_engine(5)
    games = [
        Game.from_ptn_moves(5, ["a1", "e5"]),
        Game.from_ptn_moves(5, ["a5", "e1", "b1", "d5", "b2", "d4", "b3",
                                "d3", "b4"]),  # black b5 road threat zone
        Game.from_ptn_moves(5, ["a1", "e5", "c3", "c4", "d3", "d4", "b3",
                                "b4"]),
    ]
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[g.state for g in games]
    )
    ref = np.asarray(jax.vmap(engine.wins_in_one)(states))
    fused = engine.wins_in_one_fused_fn(block_g=8, interpret=True)
    got = np.asarray(fused(states))
    np.testing.assert_array_equal(got, ref)


def test_fused_wins_scan_chunked_parity():
    """Action-chunked wins_in_one (lax.scan over action blocks, bounded
    live memory for big boards) == single-launch == vmapped oracle,
    exactly — including a chunk size that does not divide A."""
    import jax.numpy as jnp

    from tak_tpu.engine.core import get_engine

    engine = get_engine(5)
    A = engine.num_actions
    games = [
        Game.from_ptn_moves(5, ["a1", "e5"]),
        Game.from_ptn_moves(5, ["a5", "e1", "b1", "d5", "b2", "d4", "b3",
                                "d3", "b4"]),  # black b5 road threat zone
        Game.from_ptn_moves(5, ["a1", "e5", "c3", "c4", "d3", "d4", "b3",
                                "b4"]),
    ]
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[g.state for g in games]
    )
    ref = np.asarray(jax.vmap(engine.wins_in_one)(states))
    for chunk in (256, 500):  # 500 does not divide 1575 -> padded tail
        fused = engine.wins_in_one_fused_fn(
            block_g=8, interpret=True, action_chunk=chunk)
        got = np.asarray(fused(states))
        np.testing.assert_array_equal(got, ref)
    # auto-chunk trigger: tiny max_rows forces the scan path
    fused_auto = engine.wins_in_one_fused_fn(
        block_g=8, interpret=True, max_rows=1024)
    np.testing.assert_array_equal(np.asarray(fused_auto(states)), ref)
