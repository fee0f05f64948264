"""HBM-edge-tier fused MCTS kernels vs the XLA reference path.

Same oracle strategy as tests/test_pallas_mcts.py (interpreter mode on
CPU): wave_size == 1 searches must produce BITWISE-identical trees to
`MCTS._descend_wave`; wider waves must agree on all node-index-invariant
state.  The HBM kernels additionally exercise per-row DMA and
input/output aliasing of the [B, M, K] edge arrays (pallas_hbm.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig

from tests.test_pallas_mcts import assert_root_equal, varied_eval


def run_pair(n, moves, num_sims, wave_size, k, batch=2, node_budget=None,
             backends=("xla", "pallas_hbm")):
    engine = get_engine(n)
    eval_fn = varied_eval(engine)
    out = []
    for backend in backends:
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
        out.append((mcts, tree))
    return out


def test_wave1_bitwise_tree_equality_hbm():
    (m_x, t_x), (m_h, t_h) = run_pair(
        3, ["a3", "c3", "c2"], num_sims=48, wave_size=1, k=32
    )
    assert m_h._pallas_kind == "hbm"
    assert_root_equal(t_x, t_h)
    for name in (
        "parent", "parent_slot", "parent_action", "expanded",
        "edge_action", "edge_child", "edge_n", "edge_virt", "result",
        "edge_w", "edge_prior",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_x, name)), np.asarray(getattr(t_h, name)),
            err_msg=name,
        )


def test_wave1_hbm_matches_vmem_kernel():
    """The two Pallas tiers run the same algorithm: bitwise-equal trees."""
    (m_v, t_v), (m_h, t_h) = run_pair(
        4, ["a4", "d4", "b2"], num_sims=40, wave_size=1, k=24,
        backends=("pallas", "pallas_hbm"),
    )
    assert (m_v._pallas_kind, m_h._pallas_kind) == ("vmem", "hbm")
    for name in (
        "parent", "parent_slot", "parent_action", "expanded",
        "edge_action", "edge_child", "edge_n", "edge_virt", "edge_w",
        "edge_prior",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_v, name)), np.asarray(getattr(t_h, name)),
            err_msg=name,
        )
    assert_root_equal(t_v, t_h)


def test_wave8_root_stats_and_moves_hbm():
    (m_x, t_x), (m_h, t_h) = run_pair(
        4, ["a4", "d4", "b2"], num_sims=96, wave_size=8, k=48
    )
    assert_root_equal(t_x, t_h)
    rng = jax.random.PRNGKey(7)
    exploit = jnp.ones(2, bool)
    np.testing.assert_array_equal(
        np.asarray(m_x.select_moves(rng, t_x, exploit)),
        np.asarray(m_h.select_moves(rng, t_h, exploit)),
    )


def test_pool_exhaustion_matches_hbm():
    (m_x, t_x), (m_h, t_h) = run_pair(
        3, ["a3", "c3"], num_sims=64, wave_size=1, k=16, node_budget=20
    )
    assert_root_equal(t_x, t_h)
    assert int(t_h.next_free[0]) == 20


def test_auto_backend_tiering():
    """auto on CPU -> XLA; forced sizes pick the right Pallas tier."""
    from tak_tpu.mcts.pallas_hbm import MAX_HBM_NODES, fits_hbm
    from tak_tpu.mcts.pallas_ops import fits_in_vmem

    assert fits_in_vmem(514, 64, 9036)
    assert not fits_in_vmem(20002, 96, 9036)
    assert fits_hbm(20002)
    assert not fits_hbm(MAX_HBM_NODES + 1)

    engine = get_engine(3)
    cfg = SearchConfig(num_sims=8, wave_size=4, max_children=8,
                       backend="auto")
    mcts = MCTS(engine, varied_eval(engine), cfg)
    assert mcts._pallas_kind is None  # CPU -> XLA
