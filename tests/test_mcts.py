"""Search correctness with a fake network (alpha-tak/src/search/tests.rs).

DummyNet parity: policy_eval returns all-ones policy and eval 0
(tests.rs:28-35), decoupling search behavior from learned weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.mcts.tree import root_visit_counts
from tak_tpu.types import ONGOING, WHITE_ROAD


def dummy_eval(engine):
    A = engine.num_actions

    def eval_fn(params, states):
        batch = states.ply.shape[0]
        return jnp.ones((batch, A), jnp.float32), jnp.zeros(batch, jnp.float32)

    return eval_fn


def make_mcts(engine, num_sims, wave_size=1, k=128):
    cfg = SearchConfig(num_sims=num_sims, wave_size=wave_size, max_children=k)
    return MCTS(engine, dummy_eval(engine), cfg)


def run_search(mcts, game):
    states = jax.tree.map(lambda x: x[None], game.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    return tree


def best_move(mcts, tree):
    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    return int(len(visits) - 1 - np.argmax(visits[::-1]))


def test_win_in_one():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    mcts = make_mcts(engine, 1000)
    tree = run_search(mcts, g)
    g.play_action(best_move(mcts, tree))
    assert g.result == WHITE_ROAD


def test_prevent_win_in_two():
    engine = get_engine(3)
    mcts = make_mcts(engine, 1000)

    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    # black to move: must interfere with white's c-file road threat
    tree = run_search(mcts, g)
    g.play_action(best_move(mcts, tree))
    assert g.result == ONGOING

    # white to move: must not be able to win now
    tree = run_search(mcts, g)
    g.play_action(best_move(mcts, tree))
    assert g.result == ONGOING


def test_bigger_waves_find_win():
    """Leaf-parallel waves (virtual loss) still find a mate-in-1."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    mcts = make_mcts(engine, 512, wave_size=8)
    tree = run_search(mcts, g)
    g.play_action(best_move(mcts, tree))
    assert g.result == WHITE_ROAD


def test_visit_conservation():
    """Total root visits == sims + 1 (prepare) and no virtual residue."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    mcts = make_mcts(engine, 128, wave_size=4)
    tree = run_search(mcts, g)
    assert int(tree.n0[0]) == 128 + 1
    assert int(jnp.sum(tree.root_virt)) == 0
    assert int(jnp.sum(tree.edge_virt)) == 0
    assert int(tree.virt0[0]) == 0
    # root children visits sum to the number of simulations
    assert int(jnp.sum(tree.root_n)) == 128


def test_pool_full_no_virtual_leak():
    """When the node pool fills mid-search, descents degrade to root
    re-evals; they must NOT leak root-edge virtual losses (a leak starves
    root_n and blinds select_moves once trees are reused)."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    cfg = SearchConfig(num_sims=96, wave_size=4, max_children=16,
                       node_budget=12)  # fills almost immediately
    mcts = MCTS(engine, dummy_eval(engine), cfg)
    tree = run_search(mcts, g)
    assert int(tree.next_free[0]) == 12
    assert int(jnp.sum(tree.root_virt)) == 0, "leaked root virtual losses"
    assert int(jnp.sum(tree.edge_virt)) == 0
    assert int(tree.virt0[0]) == 0
    # visits still accumulated on the materialized children
    assert int(jnp.sum(tree.root_n)) > 0
