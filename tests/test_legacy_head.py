"""Legacy Net5-style dense policy head (1575 moves) end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.examples import Example, state_to_host
from tak_tpu.game import Game
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig
from tak_tpu.sizes import legacy_action_space


def test_legacy_symmetry_closure():
    t = get_engine(5).tables
    L = legacy_action_space(5)
    ident = np.arange(L)
    assert (t.legacy_sym_action[0] == ident).all()
    for i in range(8):
        assert np.array_equal(np.sort(t.legacy_sym_action[i]), ident)


def test_dense_head_inference_scatters_to_channel_space():
    engine = get_engine(5)
    net = Network(engine, NetConfig(n=5, filters=8, blocks=1,
                                    policy_head="dense"))
    v = net.init_variables(0)
    g = Game.from_ptn_moves(5, ["a1", "e5"])
    states = jax.tree.map(lambda x: x[None], g.state)
    probs, value = net.policy_eval_states(v, states)
    assert probs.shape == (1, engine.num_actions)
    # mass only on legacy-representable moves, sums to 1
    legacy = np.asarray(engine.tables.legacy_actions)
    mask = np.zeros(engine.num_actions, bool)
    mask[legacy] = True
    p = np.asarray(probs[0])
    assert abs(p.sum() - 1.0) < 1e-5
    assert p[~mask].sum() == 0.0


def test_dense_head_search_and_train():
    engine = get_engine(5)
    net = Network(engine, NetConfig(n=5, filters=8, blocks=1,
                                    policy_head="dense"))
    v = net.init_variables(0)
    eval_fn = lambda p, s: net.policy_eval_states(p, s)
    mcts = MCTS(engine, eval_fn,
                SearchConfig(num_sims=16, wave_size=4, max_children=32))
    g = Game.from_ptn_moves(5, ["a1", "e5"])
    states = jax.tree.map(lambda x: x[None], g.state)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(v, tree)
    tree = mcts.run_sims(v, tree)
    assert int(tree.n0[0]) == 17

    rng = np.random.default_rng(0)
    exs = []
    for _ in range(20):
        acts = rng.choice(engine.tables.legacy_actions, size=4, replace=False)
        exs.append(Example(
            state=state_to_host(g.state),
            actions=acts.astype(np.int32),
            visits=rng.integers(1, 9, size=4).astype(np.int32),
            result=1.0,
        ))
    v2 = net.train(v, exs, rng=np.random.default_rng(1),
                   chunk_size=10, chunks_in_step=1, log=lambda m: None)
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          v["params"], v2["params"])
    assert max(jax.tree.leaves(deltas)) > 0
