"""Differential test: pointer-doubling reachability == children closure.

`reuse._reach_doubling` replaced the level-by-level children-closure
while_loop on the reroot path (one iteration per tree LEVEL is
hundreds of ms per reroot at 10k-sim depths).  It relies on eviction
invariants (victims childless, live parents never evicted, dead slots
failing the backlink check); this test checks slot-for-slot equality
against the original closure on real searched trees, with and without
node recycling (recycling leaves stale parent pointers and stale edge
rows in evicted/reused slots — the hazardous cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.reuse import (
    _reach_closure_reference,
    _reach_doubling,
    reroot,
)
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.mcts.tree import NONE


def _eval_fn(engine, seed=0):
    A = engine.num_actions
    key = jax.random.PRNGKey(seed)
    # fixed random priors: uneven trees exercise deeper chains
    prior = jax.random.uniform(key, (A,))

    def eval_fn(params, states):
        b = states.ply.shape[0]
        return jnp.broadcast_to(prior, (b, A)), jnp.zeros(b, jnp.float32)

    return eval_fn


@pytest.mark.parametrize("recycle,budget,sims", [
    (False, 600, 512),
    (True, 96, 512),     # heavy eviction pressure: many stale slots
    (True, 200, 1024),
])
def test_reach_doubling_matches_closure(recycle, budget, sims):
    engine = get_engine(4)
    cfg = SearchConfig(num_sims=sims, wave_size=8, max_children=32,
                       node_budget=budget, recycle=recycle, backend="xla")
    mcts = MCTS(engine, _eval_fn(engine), cfg)
    states = engine.initial_batch(2, 4)
    states = engine.batched_step(states, jnp.array([0, 5], jnp.int32))
    states = engine.batched_step(states, jnp.array([15, 12], jnp.int32))
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(None, tree)
    tree = mcts.run_sims(None, tree)

    # also test a SECOND-generation tree (post-reroot slots interleaved)
    visits = np.asarray(tree.root_n)
    acts = visits.argmax(-1).astype(np.int32)
    nxt = engine.batched_step(states, jnp.asarray(acts))
    tree2 = jax.vmap(
        lambda t, a, s: reroot(engine, t, a, s, cfg.max_children)
    )(tree, jnp.asarray(acts), nxt)
    tree2 = mcts.prepare_root(None, tree2)
    tree2 = mcts.run_sims(None, tree2)

    for t in (tree, tree2):
        for b in range(2):
            tb = jax.tree.map(lambda x: x[b], t)
            root_child = np.asarray(tb.root_child)
            for action in range(root_child.shape[0]):
                c0 = root_child[action]
                if c0 == NONE:
                    continue
                got = np.asarray(_reach_doubling(
                    tb, jnp.int32(c0), jnp.bool_(True)))
                want = np.asarray(_reach_closure_reference(
                    tb, jnp.int32(c0), jnp.bool_(True)))
                mismatch = np.nonzero(got != want)[0]
                assert mismatch.size == 0, (
                    f"action {action} c0 {c0}: slots {mismatch[:10]} "
                    f"doubling={got[mismatch[:10]]} closure={want[mismatch[:10]]}"
                )
