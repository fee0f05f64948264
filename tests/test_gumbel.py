"""Gumbel root selection (sequential halving) — search quality + schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.types import ONGOING, WHITE_ROAD


def dummy_eval(engine):
    A = engine.num_actions

    def eval_fn(params, states):
        batch = states.ply.shape[0]
        return jnp.ones((batch, A), jnp.float32), jnp.zeros(batch, jnp.float32)

    return eval_fn


def make_gumbel_mcts(engine, num_sims, wave_size=1, m=16):
    cfg = SearchConfig(num_sims=num_sims, wave_size=wave_size,
                       max_children=32, gumbel_m=m)
    return MCTS(engine, dummy_eval(engine), cfg)


def run_gumbel(mcts, game, seed=0):
    states = jax.tree.map(lambda x: x[None], game.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree, gumbel = mcts.run_sims_gumbel(None, tree, jax.random.PRNGKey(seed))
    return tree, gumbel


def test_schedule_is_sequential_halving():
    engine = get_engine(3)
    mcts = make_gumbel_mcts(engine, num_sims=32, wave_size=1, m=8)
    seq = np.asarray(mcts._considered_seq)
    assert seq.shape == (32,)
    assert seq[0] == 0 and (np.diff(seq) >= 0).all()
    # phase 1: all 8 considered actions get their first visit
    assert (seq[:8] == 0).all()
    # the schedule deepens: the last entries exceed the first phase
    assert seq[-1] > 0


def test_gumbel_finds_win_in_one():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    mcts = make_gumbel_mcts(engine, num_sims=128, wave_size=1, m=16)
    for seed in range(3):
        tree, gumbel = run_gumbel(mcts, g, seed)
        act = int(np.asarray(mcts.select_moves_gumbel(tree, gumbel))[0])
        g2 = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
        g2.play_action(act)
        assert g2.result == WHITE_ROAD, f"seed {seed} picked {act}"


def test_gumbel_prevents_win_in_two():
    engine = get_engine(3)
    mcts = make_gumbel_mcts(engine, num_sims=1024, wave_size=2, m=8)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    tree, gumbel = run_gumbel(mcts, g, seed=1)
    act = int(np.asarray(mcts.select_moves_gumbel(tree, gumbel))[0])
    g.play_action(act)
    assert g.result == ONGOING  # black interfered with the c-file road
    # white must not have a win now
    tree, gumbel = run_gumbel(mcts, g, seed=2)
    act = int(np.asarray(mcts.select_moves_gumbel(tree, gumbel))[0])
    g.play_action(act)
    assert g.result == ONGOING


def test_gumbel_policy_weights_normalized():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3"])
    mcts = make_gumbel_mcts(engine, num_sims=32, wave_size=2, m=8)
    tree, _ = run_gumbel(mcts, g)
    pi = np.asarray(mcts.gumbel_policy_weights(tree))[0]
    legal = np.asarray(jax.vmap(engine.legal_mask)(
        jax.tree.map(lambda x: x[None], g.state)))[0]
    assert abs(pi.sum() - 1.0) < 1e-5
    assert (pi[~legal] == 0).all()
    assert (pi[legal] > 0).any()


def test_gumbel_rejects_pallas_backend():
    engine = get_engine(3)
    cfg = SearchConfig(num_sims=8, wave_size=2, gumbel_m=4, backend="pallas")
    with pytest.raises(ValueError):
        MCTS(engine, dummy_eval(engine), cfg)
