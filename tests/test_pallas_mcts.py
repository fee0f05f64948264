"""Fused Pallas descent kernel vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (tests/conftest.py forces the
CPU platform) and checks it against `MCTS._descend_wave`:

  * wave_size == 1: node allocation order coincides, so the WHOLE tree
    must match bitwise after a full search.
  * wave_size > 1: descents resolve the same structural leaves but may
    allocate node indices in a different order than the staggered XLA
    pipeline; all node-index-invariant state (root statistics, visit
    totals, pool usage, move selection) must still match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.mcts.tree import root_visit_counts


def varied_eval(engine):
    """Deterministic fake network with non-uniform, state-dependent priors."""
    A = engine.num_actions

    def eval_fn(params, states):
        feat = (
            states.ply.astype(jnp.float32)
            + jnp.sum(states.heights, -1).astype(jnp.float32) * 1.7
            + states.to_move.astype(jnp.float32) * 0.3
        )
        logits = jnp.sin(
            feat[:, None] * 0.7 + jnp.arange(A, dtype=jnp.float32)[None, :] * 0.31
        )
        value = jnp.tanh(jnp.sin(feat * 1.3) * 0.5)
        return jax.nn.softmax(logits, -1), value

    return eval_fn


def run_pair(n, moves, num_sims, wave_size, k, batch=2, node_budget=None):
    engine = get_engine(n)
    eval_fn = varied_eval(engine)
    trees = []
    for backend in ("xla", "pallas"):
        cfg = SearchConfig(
            num_sims=num_sims, wave_size=wave_size, max_children=k,
            node_budget=node_budget, backend=backend,
        )
        mcts = MCTS(engine, eval_fn, cfg)
        g = Game.from_ptn_moves(n, moves)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), g.state
        )
        tree = mcts.init_batch(states)
        tree = mcts.prepare_root(None, tree)
        tree = mcts.run_sims(None, tree)
        trees.append((mcts, tree))
    return trees


def assert_root_equal(ta, tb):
    np.testing.assert_array_equal(np.asarray(ta.n0), np.asarray(tb.n0))
    np.testing.assert_array_equal(np.asarray(ta.virt0), np.asarray(tb.virt0))
    np.testing.assert_array_equal(
        np.asarray(ta.next_free), np.asarray(tb.next_free)
    )
    np.testing.assert_array_equal(np.asarray(ta.root_n), np.asarray(tb.root_n))
    np.testing.assert_array_equal(
        np.asarray(ta.root_virt), np.asarray(tb.root_virt)
    )
    np.testing.assert_allclose(
        np.asarray(ta.root_w), np.asarray(tb.root_w), rtol=0, atol=0
    )


def test_wave1_bitwise_tree_equality():
    (m_x, t_x), (m_p, t_p) = run_pair(
        3, ["a3", "c3", "c2"], num_sims=48, wave_size=1, k=32
    )
    assert_root_equal(t_x, t_p)
    for name in (
        "parent", "parent_slot", "parent_action", "expanded",
        "edge_action", "edge_child", "edge_n", "edge_virt", "result",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_x, name)), np.asarray(getattr(t_p, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(t_x.edge_w), np.asarray(t_p.edge_w)
    )
    np.testing.assert_array_equal(
        np.asarray(t_x.edge_prior), np.asarray(t_p.edge_prior)
    )


def test_wave8_root_stats_and_moves():
    (m_x, t_x), (m_p, t_p) = run_pair(
        4, ["a4", "d4", "b2"], num_sims=96, wave_size=8, k=48
    )
    assert_root_equal(t_x, t_p)
    rng = jax.random.PRNGKey(7)
    exploit = jnp.ones(2, bool)
    mv_x = m_x.select_moves(rng, t_x, exploit)
    mv_p = m_p.select_moves(rng, t_p, exploit)
    np.testing.assert_array_equal(np.asarray(mv_x), np.asarray(mv_p))


def test_wave8_visit_conservation_pallas():
    engine = get_engine(3)
    cfg = SearchConfig(num_sims=128, wave_size=4, max_children=32,
                       backend="pallas")
    from tests.test_mcts import dummy_eval

    mcts = MCTS(engine, dummy_eval(engine), cfg)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    assert int(tree.n0[0]) == 128 + 1
    assert int(jnp.sum(tree.root_virt)) == 0
    assert int(jnp.sum(tree.edge_virt)) == 0
    assert int(tree.virt0[0]) == 0
    assert int(jnp.sum(tree.root_n)) == 128


def test_pool_exhaustion_matches():
    """Tiny node budget: pool-full fallback (re-eval parent) must agree."""
    (m_x, t_x), (m_p, t_p) = run_pair(
        3, ["a3", "c3"], num_sims=64, wave_size=1, k=16, node_budget=20
    )
    assert_root_equal(t_x, t_p)
    assert int(t_x.next_free[0]) == 20  # the pool actually filled


def test_win_in_one_pallas():
    from tests.test_mcts import dummy_eval
    from tak_tpu.types import WHITE_ROAD

    engine = get_engine(3)
    cfg = SearchConfig(num_sims=512, wave_size=8, max_children=32,
                       backend="pallas")
    mcts = MCTS(engine, dummy_eval(engine), cfg)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    g.play_action(int(len(visits) - 1 - np.argmax(visits[::-1])))
    assert g.result == WHITE_ROAD
