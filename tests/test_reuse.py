"""Tree-reuse (re-rooting) correctness (search/play.rs:26-43 capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.game import Game
from tak_tpu.mcts.reuse import reroot
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.mcts.tree import NONE, root_visit_counts
from tak_tpu.player import Player
from tak_tpu.types import ONGOING, WHITE_ROAD


def dummy_eval(engine):
    A = engine.num_actions

    def eval_fn(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    return eval_fn


def test_reroot_preserves_subtree_stats():
    engine = get_engine(3)
    cfg = SearchConfig(num_sims=256, wave_size=4, max_children=32,
                       node_budget=1024)
    mcts = MCTS(engine, dummy_eval(engine), cfg)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)

    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    action = int(len(visits) - 1 - np.argmax(visits[::-1]))
    child = int(tree.root_child[0, action])
    assert child != NONE
    child_edge_n = np.asarray(tree.edge_n[0, child]).copy()
    child_edge_acts = np.asarray(tree.edge_action[0, child]).copy()
    child_total = int(visits[action])

    g2 = g.clone()
    g2.play_action(action, check=False)
    new_states = jax.tree.map(lambda x: x[None], g2.state)
    new_tree = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children)
    )(tree, jnp.array([action]), new_states)

    # the new root's per-action visit counts equal the old child's edges
    new_visits = np.asarray(new_tree.root_n[0])
    for act, n in zip(child_edge_acts, child_edge_n):
        if act != NONE:
            assert new_visits[act] == n, (act, n)
    assert int(new_tree.n0[0]) == child_total
    assert int(new_tree.next_free[0]) <= int(tree.next_free[0])
    # new root state is the played position
    assert int(new_tree.state.ply[0, 0]) == g2.ply
    # searching on the re-rooted tree still works and accumulates
    new_tree = mcts.prepare_root(None, new_tree)
    new_tree = mcts.run_sims(None, new_tree)
    assert int(new_tree.n0[0]) == child_total + 1 + cfg.num_sims


def test_player_reuse_win_in_two():
    """prevent_win_in_two with tree reuse across moves (tests.rs:52-72)."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    player = Player(engine, dummy_eval(engine), None, g,
                    wave_size=8, max_children=32, node_budget=4096)
    for _ in range(125):
        player.rollout()
    mv = player.pick_move(True)
    player.play_move(mv)
    assert player.game.result == ONGOING
    for _ in range(125):
        player.rollout()
    player.play_move(player.pick_move(True))
    assert player.game.result == ONGOING


def test_reroot_unvisited_action_degrades_to_fresh():
    engine = get_engine(3)
    cfg = SearchConfig(num_sims=16, wave_size=4, max_children=32,
                       node_budget=256)
    mcts = MCTS(engine, dummy_eval(engine), cfg)
    g = Game(3)
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)
    # pick a legal action with no materialized child
    child = np.asarray(tree.root_child[0])
    legal = np.asarray(tree.root_legal[0])
    cand = [a for a in np.nonzero(legal)[0] if child[a] == NONE]
    if not cand:  # every action explored; nothing to test
        return
    action = int(cand[0])
    g2 = g.clone()
    g2.play_action(action, check=False)
    new_states = jax.tree.map(lambda x: x[None], g2.state)
    new_tree = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children)
    )(tree, jnp.array([action]), new_states)
    assert int(new_tree.next_free[0]) == 1
    assert int(new_tree.n0[0]) == 0
    assert not bool(new_tree.expanded[0, 0])
    # still searchable
    new_tree = mcts.prepare_root(None, new_tree)
    new_tree = mcts.run_sims(None, new_tree)
    assert int(new_tree.n0[0]) == 1 + cfg.num_sims


def test_player_drops_oversized_carried_tree():
    """Player blanks a re-rooted tree whose carried subtree would starve
    the next search's node pool (regression: pool-starved searches back
    up into n0 only, leaving select_moves blind)."""
    import jax.numpy as jnp

    from tak_tpu.engine.core import get_engine
    from tak_tpu.game import Game
    from tak_tpu.player import Player

    engine = get_engine(3)
    A = engine.num_actions

    def eval_fn(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    game = Game.with_komi(3, 0)
    player = Player(engine, eval_fn, None, game, wave_size=8,
                    node_budget=24)
    for mv in ("a1", "c3"):
        player.play_move(mv, with_info=False)
    player.rollout()
    # force the carried tree past the guard threshold: every child of the
    # root must stay materialized so the re-rooted subtree stays "big"
    mv = player.pick_move(True)
    big = player.tree.replace(
        next_free=jnp.full_like(player.tree.next_free, 23)
    )
    # simulate reroot keeping most of the pool: patch _reroot to report a
    # large compacted size
    orig = player._reroot
    player._reroot = lambda t, a, s: orig(t, a, s).replace(
        next_free=jnp.full_like(t.next_free, 20)
    )
    player.tree = big
    player.play_move(mv, with_info=False)
    assert player.tree is None  # oversized carry dropped
    # and the player still searches fine afterwards
    player._reroot = orig
    player.rollout()
    assert int(player.tree.n0[0]) > 0


def test_player_recycled_ponder_tier():
    """Player(recycle=True): bounded VMEM pool serves rollouts past its
    size via eviction, keeps carried subtrees (no oversize blank), and
    still finds the win-in-2 defense (tests.rs:52-72 semantics)."""
    engine = get_engine(3)
    g = Game.from_ptn_moves(3, ["a3", "c3", "c2"])
    player = Player(engine, dummy_eval(engine), None, g,
                    wave_size=8, node_budget=128, recycle=True)
    assert player.mcts.config.recycle
    for _ in range(80):  # 640 sims through a 128-node pool
        player.rollout()
    assert int(player.tree.next_free[0]) <= 128
    mv = player.pick_move(True)
    player.play_move(mv)
    # recycling searches evict their own headroom: carried tree kept
    assert player.tree is not None
    for _ in range(80):
        player.rollout()
    player.play_move(player.pick_move(True))
    assert player.game.result == ONGOING


def test_reroot_keep_compacts_carry_losslessly():
    """reroot(keep=k): the carried subtree is capped at k nodes by
    dropping the coldest CHILDLESS nodes; every backed-up statistic the
    uncapped reroot exposes at the root tier survives (aggregates live
    on parent edges), and dropped children just show child=NONE."""
    engine = get_engine(3)
    cfg = SearchConfig(num_sims=128, wave_size=4, max_children=32,
                       node_budget=512)
    mcts = MCTS(engine, dummy_eval(engine), cfg)
    g = Game.from_ptn_moves(3, ["a1", "c3"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)

    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    action = int(visits.argmax())
    g2 = g.clone()
    g2.play_action(action, check=False)
    new_states = jax.tree.map(lambda x: x[None], g2.state)

    full = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children)
    )(tree, jnp.array([action]), new_states)
    n_full = int(full.next_free[0])
    keep = max(2, n_full // 2)
    capped = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children,
                               keep=keep)
    )(tree, jnp.array([action]), new_states)

    assert int(capped.next_free[0]) <= keep < n_full
    # root-tier aggregates identical: n0 and per-action visit/value sums
    assert int(capped.n0[0]) == int(full.n0[0])
    np.testing.assert_array_equal(np.asarray(capped.root_n[0]),
                                  np.asarray(full.root_n[0]))
    np.testing.assert_allclose(np.asarray(capped.root_w[0]),
                               np.asarray(full.root_w[0]), rtol=1e-6)
    # child_count is consistent with the compacted edge rows
    ec = np.asarray(capped.edge_child[0])
    cc = np.asarray(capped.child_count[0])
    exp = np.asarray(capped.expanded[0])
    want = np.where(exp, (ec != NONE).sum(-1), 0)
    np.testing.assert_array_equal(cc, want)
    # and the capped tree still searches (prepare_root then sims)
    capped = mcts.prepare_root(None, capped)
    capped = mcts.run_sims(None, capped)
    assert int(np.asarray(jax.vmap(root_visit_counts)(capped)).sum()) > 0


def test_selfplay_with_reroot_keep(engine=None):
    """Full self-play loop with recycled pool + reroot carry cap."""
    from tak_tpu.selfplay import SelfPlayActor, SelfPlayConfig

    eng = get_engine(3)
    cfg = SelfPlayConfig(
        games=2, workers=2, komi=0,
        search=SearchConfig(num_sims=64, wave_size=4, max_children=16,
                            recycle=True, node_budget=96, reroot_keep=48),
        noise_plies=8, exploit_plies=4,
    )
    actor = SelfPlayActor(eng, dummy_eval(eng), cfg)
    examples = actor.run(None, seed=13, log=lambda m: None)
    assert examples
    for ex in examples:
        assert ex.visits.sum() > 0


def test_reroot_keep_hard_cap_on_chain_carry():
    """`keep` is a HARD cap even for chain-shaped carries.

    A near-delta prior with wave 1 makes every sim descend the same
    line, so the carried subtree is one deep chain with a single
    childless tip — the shape where a one-pass drop (only currently-
    childless nodes) would leave next_free far above `keep`.  The
    iterated drop must converge to <= keep."""
    engine = get_engine(3)
    A = engine.num_actions
    key = jax.random.PRNGKey(7)
    peaked = jax.nn.softmax(jax.random.uniform(key, (A,)) * 60.0)

    def eval_fn(params, states):
        b = states.ply.shape[0]
        return jnp.broadcast_to(peaked, (b, A)), jnp.zeros(b, jnp.float32)

    cfg = SearchConfig(num_sims=48, wave_size=1, max_children=8,
                       node_budget=256)
    mcts = MCTS(engine, eval_fn, cfg)
    g = Game.from_ptn_moves(3, ["a1", "c3"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)

    visits = np.asarray(jax.vmap(root_visit_counts)(tree))[0]
    action = int(visits.argmax())
    g2 = g.clone()
    g2.play_action(action, check=False)
    new_states = jax.tree.map(lambda x: x[None], g2.state)

    full = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children)
    )(tree, jnp.array([action]), new_states)
    n_full = int(full.next_free[0])
    assert n_full > 16, f"carry too small to exercise the cap ({n_full})"

    for keep in (4, 8):
        capped = jax.vmap(
            lambda t, a, s: reroot(engine, t, a, s, cfg.max_children,
                                   keep=keep)
        )(tree, jnp.array([action]), new_states)
        assert int(capped.next_free[0]) <= keep, (
            f"keep={keep} left next_free={int(capped.next_free[0])}"
        )
        # root-tier aggregates survive (loss class = in-search eviction)
        assert int(capped.n0[0]) == int(full.n0[0])
        np.testing.assert_array_equal(np.asarray(capped.root_n[0]),
                                      np.asarray(full.root_n[0]))
        # and it still searches
        capped = mcts.prepare_root(None, capped)
        capped = mcts.run_sims(None, capped)
        assert int(np.asarray(jax.vmap(root_visit_counts)(capped)).sum()) > 0
