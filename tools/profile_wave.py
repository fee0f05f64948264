"""Time each component of one MCTS wave on the chip.

Usage: PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_wave.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from tak_tpu.engine.core import Engine
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig

N = int(os.environ.get("BENCH_SIZE", 6))
B = int(os.environ.get("BENCH_MCTS_BATCH", 256))
V = int(os.environ.get("BENCH_MCTS_WAVE", 16))
K = int(os.environ.get("BENCH_MCTS_K", 64))
SIMS = int(os.environ.get("BENCH_MCTS_SIMS", 512))
# recycled/sustained mode (the self-play production tier): bounded pool
# with per-descent eviction, components timed on a FULL pool (a deep
# search fills it first) so the numbers include evict work + deep
# descents — the round-4 gap nobody had measured directly.
RECYCLE = os.environ.get("BENCH_RECYCLE", "0") == "1"
BUDGET = int(os.environ.get("BENCH_BUDGET", 1280))
SCAN_CHUNK = int(os.environ.get("BENCH_SCAN_CHUNK", 0)) or None
SUSTAIN = os.environ.get("BENCH_SUSTAIN", "1" if RECYCLE else "0") == "1"

engine = Engine(N)
net = Network(engine, NetConfig.for_size(N))
variables = net.init_variables(0)
cfg = SearchConfig(num_sims=SIMS, wave_size=V, max_children=K,
                   recycle=RECYCLE, node_budget=BUDGET if RECYCLE else None,
                   scan_chunk=SCAN_CHUNK)
mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)

roots = engine.initial_batch(B, 4)
roots = engine.batched_step(roots, jnp.zeros(B, jnp.int32))
roots = engine.batched_step(roots, jnp.full(B, engine.num_squares - 1, jnp.int32))
tree = mcts.init_batch(roots)
tree = mcts.prepare_root(variables, tree)
if SUSTAIN:
    # fill the pool: component timings below then measure the sustained
    # regime (every create evicts, descents at full depth)
    tree = mcts.run_sims(variables, tree)
    import numpy as _np

    print("pool fill:", _np.asarray(tree.next_free).min(), "/", cfg.max_nodes)
print("use_pallas:", mcts._use_pallas, "max_nodes:", cfg.max_nodes,
      "recycle:", RECYCLE, "sustained:", SUSTAIN)


def _readback(out):
    # block_until_ready does NOT wait on the axon backend; force a host
    # readback of one scalar to drain the dispatch queue (see CLAUDE.md)
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _readback(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt * 1e3:8.2f} ms")
    return out, dt


# 1. descent kernel alone
descend = jax.jit(lambda t: mcts._descend(t))
(tree_d, leaves, created), t_desc = timeit("descend (pallas)", descend, tree)

# 2. leaf states (env step) alone
def leaf_states_fn(tree_b, leaves):
    def leaf_states_one(tree, ls):
        def one_leaf(leaf):
            p = tree.parent[leaf]
            a = tree.parent_action[leaf]
            parent_state = jax.tree.map(lambda x: x[jnp.maximum(p, 0)], tree.state)
            stepped = engine.step(parent_state, jnp.maximum(a, 0))
            root_state = jax.tree.map(lambda x: x[0], tree.state)
            is_root = leaf == 0
            return jax.tree.map(
                lambda a_, b_: jnp.where(is_root, b_, a_), stepped, root_state
            )
        return jax.vmap(one_leaf)(ls)
    return jax.vmap(leaf_states_one)(tree_b, leaves)

leaf_states_j = jax.jit(leaf_states_fn)
(leaf_states), t_leaf = timeit("leaf env step", leaf_states_j, tree_d, leaves)

flat_states = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), leaf_states)

# 3. observe alone
obs_j = jax.jit(net.observe_batch)
planes, t_obs = timeit("observe", obs_j, flat_states)

# 4. NN forward alone (on planes)
fwd_j = jax.jit(lambda v, p: net.policy_eval(v, p))
(policy, value), t_fwd = timeit("nn forward", fwd_j, variables, planes)

# 5. legal mask + topk
def lt(states, policy):
    legal = jax.vmap(engine.legal_mask)(states)
    masked = jnp.where(legal, policy, -1.0)
    return jax.lax.top_k(masked, K)

lt_j = jax.jit(lt)
(vals, aidx), t_lt = timeit("legal+topk", lt_j, flat_states, policy)

# 5b. the production split: legal alone vs packedq top-k alone
from tak_tpu.mcts.search import masked_topk

legal_j = jax.jit(lambda s: jax.vmap(engine.legal_mask)(s))
legal_m, t_legal = timeit("  legal_mask alone", legal_j, flat_states)
pk_j = jax.jit(lambda p, l: masked_topk(p, l, K, "packedq"))
_, t_pk = timeit("  masked_topk packedq", pk_j, policy, legal_m)

# 6. write_nodes + leaf_values + expand_backup kernel
leaf_results = flat_states.result.reshape(B, V)
def eb(tree_b, leaves, created, leaf_states, leaf_results, vals, aidx, value):
    tree_b = jax.vmap(mcts._write_nodes)(tree_b, leaves, created, leaf_states, leaf_results)
    return mcts._expand_backup(
        tree_b, leaves, vals.reshape(B, V, -1), aidx.reshape(B, V, -1),
        leaf_results, value.reshape(B, V),
        leaf_states.to_move.reshape(B, V),
    )

eb_j = jax.jit(eb)
_, t_eb = timeit("write+expand_backup", eb_j, tree_d, leaves, created,
                 leaf_states, leaf_results, vals, aidx, value)

# full wave for comparison
wave_j = jax.jit(lambda v, t: mcts._wave(v, t))
_, t_wave = timeit("FULL WAVE", wave_j, variables, tree)

parts = t_desc + t_leaf + t_obs + t_fwd + t_lt + t_eb
print(f"{'sum of parts':30s} {parts * 1e3:8.2f} ms")
print(f"sims/s from full wave: {B * V / t_wave:,.0f}")
