"""Node recycling (SearchConfig.recycle): bounded pools serve deep sim
budgets by evicting cold childless leaves.

Because statistics are edge-resident, eviction loses no backed-up
visits/values — only cached states/priors.  These tests pin the XLA
reference implementation: structural invariants under heavy recycling,
search semantics (win-in-1 / block-win-in-2) with pools far smaller than
the sim budget, and zero behavior change when the flag is off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.mcts.tree import NONE, root_visit_counts
from tak_tpu.types import ONGOING, WHITE_ROAD


def dummy_eval(engine):
    A = engine.num_actions

    def eval_fn(params, states):
        batch = states.ply.shape[0]
        return jnp.ones((batch, A), jnp.float32), jnp.zeros(batch, jnp.float32)

    return eval_fn


def make_mcts(engine, num_sims, wave_size=1, k=16, budget=None, recycle=True):
    cfg = SearchConfig(
        num_sims=num_sims, wave_size=wave_size, max_children=k,
        node_budget=budget, recycle=recycle, backend="xla",
    )
    return MCTS(engine, dummy_eval(engine), cfg)


def run_search(mcts, game, batch=1):
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), game.state
    )
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    return tree


def best_move(tree):
    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    return int(len(visits) - 1 - np.argmax(visits[::-1]))


def check_invariants(tree, num_sims, g=0):
    """Structural invariants after a finished search (no virt in flight,
    conservation of visits, link/count consistency)."""
    M = tree.result.shape[1]
    n0 = int(tree.n0[g])
    assert n0 == num_sims + 1  # prepare_root + one backup per sim
    assert int(tree.virt0[g]) == 0
    assert not np.asarray(tree.root_virt[g]).any()
    assert not np.asarray(tree.edge_virt[g]).any()
    assert not np.asarray(tree.node_virt[g]).any()

    root_n = np.asarray(tree.root_n[g])
    # every sim backs up through exactly one root edge (recycling never
    # degrades a descent to a rootward re-eval while candidates exist)
    assert root_n.sum() == num_sims

    # child_count == materialized children, node_n == parent edge visits
    parent = np.asarray(tree.parent[g])
    parent_slot = np.asarray(tree.parent_slot[g])
    parent_action = np.asarray(tree.parent_action[g])
    edge_child = np.asarray(tree.edge_child[g])
    edge_n = np.asarray(tree.edge_n[g])
    expanded = np.asarray(tree.expanded[g])
    child_count = np.asarray(tree.child_count[g])
    node_n = np.asarray(tree.node_n[g])
    root_child = np.asarray(tree.root_child[g])

    # node_n is the parent-edge visit snapshot at materialization: it
    # never exceeds the live edge count, and a childless non-terminal
    # can outgrow it by at most one visit
    counts = np.zeros(M, np.int64)
    attached = np.zeros(M, bool)
    attached[0] = True
    for a, c in enumerate(root_child):
        if c != NONE:
            counts[0] += 1
            attached[c] = True
            assert parent[c] == 0 and parent_slot[c] == NONE
            assert parent_action[c] == a
            assert 0 <= node_n[c] <= root_n[a]
    for i in range(M):
        if not expanded[i]:
            continue
        for s, c in enumerate(edge_child[i]):
            if c != NONE:
                counts[i] += 1
                attached[c] = True
                assert parent[c] == i and parent_slot[c] == s
                assert 0 <= node_n[c] <= edge_n[i, s]
    np.testing.assert_array_equal(child_count[attached], counts[attached])


def test_recycle_invariants_tiny_pool():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3"])
    mcts = make_mcts(engine, num_sims=256, wave_size=8, budget=40)
    tree = run_search(mcts, g, batch=2)
    assert int(tree.next_free[0]) == 40  # pool filled and held
    for game in range(2):
        check_invariants(tree, 256, game)


def test_recycle_win_in_one_tiny_pool():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2", "a2"])
    mcts = make_mcts(engine, num_sims=512, wave_size=4, budget=64)
    tree = run_search(mcts, g)
    g.play_action(best_move(tree))
    assert g.result == WHITE_ROAD


def test_recycle_prevent_win_in_two_tiny_pool():
    engine = get_engine(3)
    mcts = make_mcts(engine, num_sims=512, wave_size=4, budget=64)

    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    tree = run_search(mcts, g)
    g.play_action(best_move(tree))
    assert g.result == ONGOING

    tree = run_search(mcts, g)
    g.play_action(best_move(tree))
    assert g.result == ONGOING


def test_recycle_off_keeps_fields_zero():
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3"])
    mcts = make_mcts(engine, num_sims=64, wave_size=4, budget=32,
                     recycle=False)
    tree = run_search(mcts, g)
    assert not np.asarray(tree.node_n).any()
    assert not np.asarray(tree.node_virt).any()
    assert not np.asarray(tree.child_count).any()


def test_recycle_matches_full_pool_when_pool_big_enough():
    """With a pool that never fills, recycle=True changes nothing about
    the search statistics (the bookkeeping is pure observation)."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3"])
    t_on = run_search(make_mcts(engine, 128, wave_size=4, budget=256), g)
    t_off = run_search(
        make_mcts(engine, 128, wave_size=4, budget=256, recycle=False), g
    )
    np.testing.assert_array_equal(np.asarray(t_on.root_n),
                                  np.asarray(t_off.root_n))
    np.testing.assert_array_equal(np.asarray(t_on.edge_n),
                                  np.asarray(t_off.edge_n))
    np.testing.assert_allclose(np.asarray(t_on.root_w),
                               np.asarray(t_off.root_w))


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
            feat[:, None] * 0.7
            + jnp.arange(A, dtype=jnp.float32)[None, :] * 0.31
        )
        value = jnp.tanh(jnp.sin(feat * 1.3) * 0.5)
        return jax.nn.softmax(logits, -1), value

    return eval_fn


def run_backend(backend, n, moves, num_sims, wave_size, budget, k=32,
                batch=2):
    engine = get_engine(n)
    cfg = SearchConfig(
        num_sims=num_sims, wave_size=wave_size, max_children=k,
        node_budget=budget, recycle=True, backend=backend,
    )
    mcts = MCTS(engine, varied_eval(engine), cfg)
    g = Game.from_ptn_moves(n, moves)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), g.state
    )
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    return tree


def test_pallas_recycle_wave1_bitwise_vs_xla():
    """V=1: the kernel's sequential eviction order coincides with the
    XLA path's, so recycled trees must match bitwise (interpret mode)."""
    args = dict(n=3, moves=["a3", "c3", "c2"], num_sims=96, wave_size=1,
                budget=24)
    t_x = run_backend("xla", **args)
    t_p = run_backend("pallas", **args)
    for name in (
        "n0", "virt0", "next_free", "root_n", "root_virt", "root_child",
        "parent", "parent_slot", "parent_action", "expanded",
        "edge_action", "edge_child", "edge_n", "edge_virt", "result",
        "node_n", "node_virt", "child_count",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_x, name)), np.asarray(getattr(t_p, name)),
            err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(t_x.root_w),
                               np.asarray(t_p.root_w), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(t_x.edge_w),
                               np.asarray(t_p.edge_w), rtol=0, atol=0)


def test_pallas_recycle_invariants():
    """Kernel-tier recycled search (interpret mode) holds the same
    structural invariants as the XLA path."""
    tree = run_backend("pallas", 3, ["a3", "c3"], num_sims=128, wave_size=4,
                       budget=40)
    assert int(tree.next_free[0]) == 40
    for game in range(2):
        check_invariants(tree, 128, game)


def test_selfplay_with_recycle_and_reuse(monkeypatch):
    """Self-play end-to-end with a recycled pool smaller than the sim
    budget, tree reuse on, and the per-move legality audit enabled."""
    from tak_tpu.selfplay import SelfPlayActor, SelfPlayConfig

    monkeypatch.setenv("TAK_DEBUG_LEGAL", "1")
    engine = get_engine(3)
    cfg = SelfPlayConfig(
        games=2, workers=2, komi=0, max_plies=40,
        search=SearchConfig(num_sims=64, wave_size=8, max_children=16,
                            node_budget=48, recycle=True, backend="xla"),
    )
    actor = SelfPlayActor(engine, dummy_eval(engine), cfg)
    examples = actor.run(None, seed=5, log=lambda *_: None)
    assert len(examples) > 0
    assert all(ex.result in (-1.0, 0.0, 1.0) for ex in examples)


def test_selfplay_recycle_default_budget():
    from tak_tpu.selfplay import RECYCLE_POOL, SelfPlayActor, SelfPlayConfig

    engine = get_engine(3)
    cfg = SelfPlayConfig(
        games=1, workers=1,
        search=SearchConfig(num_sims=10_000, wave_size=8, recycle=True,
                            backend="xla"),
    )
    actor = SelfPlayActor(engine, dummy_eval(engine), cfg)
    assert actor.search_config.node_budget == RECYCLE_POOL


def test_recycle_quality_near_full_pool():
    """Root visit distributions with a 1/4-size pool stay close to the
    unbounded search (uniform dummy net, mid-game position)."""
    engine = get_engine(5)
    g = Game.from_ptn_moves(5, ["a1", "e5", "c3", "c4", "d3", "b4"])
    sims = 384
    t_small = run_search(
        make_mcts(engine, sims, wave_size=8, budget=sims // 4), g
    )
    t_full = run_search(
        make_mcts(engine, sims, wave_size=8, budget=sims + 2, recycle=False), g
    )
    p_small = np.asarray(jax.vmap(root_visit_counts)(t_small))[0].astype(float)
    p_full = np.asarray(jax.vmap(root_visit_counts)(t_full))[0].astype(float)
    p_small /= p_small.sum()
    p_full /= p_full.sum()
    tv = 0.5 * np.abs(p_small - p_full).sum()
    assert tv < 0.25, tv


def test_victim_pair_packed_lexicographic():
    """The packed single-reduction victim scan (pallas_ops._victim_pair)
    preserves the exact (min node_n, ties -> lowest index) order of the
    unpacked form, including the no-candidate and clamp edge cases.

    Runs the pure-jnp helper body directly (it is shape-polymorphic
    jnp code; no Pallas machinery needed on CPU)."""
    import jax.numpy as jnp

    from tak_tpu.mcts.pallas_ops import LANES, _victim_pair

    Mr, M = 2, 2 * LANES

    def pair(node_n, node_virt, child_count):
        class _R:  # minimal ref-like: kernel helpers index with [...]
            def __init__(self, a):
                self.a = jnp.asarray(a, jnp.int32).reshape(Mr, LANES)

            def __getitem__(self, _):
                return self.a

        return _victim_pair(
            M=M, Mr=Mr, node_n=_R(node_n), node_virt=_R(node_virt),
            child_count=_R(child_count),
        )

    zeros = [0] * M

    # ties on node_n -> lowest index wins; second candidate is the next
    nn = zeros[:]
    nn[5] = 3
    nn[9] = 3
    nn[17] = 1
    cc = [1] * M  # childless only at the three candidates
    for i in (5, 9, 17):
        cc[i] = 0
    v1, h1, v2, h2 = pair(nn, zeros, cc)
    assert (int(v1), bool(h1)) == (17, True)
    assert (int(v2), bool(h2)) == (5, True)

    # pinned nodes (node_virt > 0) and the root (index 0) are excluded
    nv = zeros[:]
    nv[17] = 1
    cc2 = [1] * M
    for i in (0, 5, 17):
        cc2[i] = 0
    v1, h1, v2, h2 = pair(nn, nv, cc2)
    assert (int(v1), bool(h1)) == (5, True)
    assert not bool(h2)

    # no candidates at all
    v1, h1, v2, h2 = pair(zeros, zeros, [1] * M)
    assert not bool(h1) and not bool(h2)

    # clamp: n beyond the pack range still yields valid candidates and
    # index-order ties among the clamped
    big = zeros[:]
    big[3] = 2 ** 29
    big[7] = 2 ** 29
    cc3 = [1] * M
    cc3[3] = cc3[7] = 0
    v1, h1, v2, h2 = pair(big, zeros, cc3)
    assert (int(v1), bool(h1)) == (3, True)
    assert (int(v2), bool(h2)) == (7, True)


def test_pm_epac_codec_roundtrip():
    """The packed node-meta (parent, slot, expanded) and packed edge
    (child, action) codecs round-trip exactly over their full ranges,
    including NONE sentinels and the size-8x8 action space."""
    import numpy as np

    from tak_tpu.mcts.pallas_ops import (
        _action_shift, _epac_pack, _pm_expanded, _pm_pack, _pm_parent,
        _pm_slot,
    )

    rng = np.random.default_rng(7)
    M, K = 2048, 128
    parent = rng.integers(-1, M, 4096).astype(np.int32)
    slot = rng.integers(-1, K, 4096).astype(np.int32)
    exp = rng.integers(0, 2, 4096).astype(np.int32)
    pm = _pm_pack(parent, slot, exp)
    assert (_pm_parent(pm) == parent).all()
    assert (_pm_slot(pm) == slot).all()
    assert (_pm_expanded(pm) == exp).all()

    for A in (1575, 9036, 65216):  # 5x5 legacy, 6x6, 8x8 channel spaces
        SA = _action_shift(A)
        child = rng.integers(-1, M, 4096).astype(np.int32)
        action = rng.integers(-1, A, 4096).astype(np.int32)
        epac = _epac_pack(child, action, SA)
        assert int(epac.max()) < 2 ** 31 - 1
        assert (epac // SA - 1 == child).all()
        assert (epac % SA - 1 == action).all()
