"""Pit gating behavior with dummy networks (offline, 3x3)."""

import jax.numpy as jnp

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.pit import PitConfig, PitResult, pit


def test_pit_result_accounting():
    r = PitResult(wins=11, losses=9, draws=4)
    assert abs(r.win_rate() - 11 / 20) < 1e-9
    assert PitResult().win_rate() == 0.0


def test_pit_runs_and_tallies():
    engine = get_engine(3)
    A = engine.num_actions

    def dummy_eval(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    cfg = PitConfig(games=4, komi=0,
                    search=SearchConfig(num_sims=32, wave_size=8,
                                        max_children=32),
                    max_plies=80)
    stats = {}
    res = pit(engine, dummy_eval, None, None, cfg, seed=7,
              log=lambda m: None, stats=stats)
    assert res.wins + res.losses + res.draws == 4
    # tree reuse is on by default (pit.rs:66-92): searches after the first
    # ply must start from carried subtrees with real root visits
    assert stats["carried_n0"] > 0


def test_pit_no_reuse_carries_nothing():
    engine = get_engine(3)
    A = engine.num_actions

    def dummy_eval(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    cfg = PitConfig(games=2, komi=0,
                    search=SearchConfig(num_sims=16, wave_size=8,
                                        max_children=32),
                    max_plies=30, tree_reuse=False)
    stats = {}
    res = pit(engine, dummy_eval, None, None, cfg, seed=3,
              log=lambda m: None, stats=stats)
    assert res.wins + res.losses + res.draws == 2
    assert stats["carried_n0"] == 0
