"""Per-phase timing of one self-play move at small worker counts.

Times prepare_root / add_noise / run_sims / select_moves / step /
reroot / example-readbacks separately (forced readback after each) to
locate where B=32 self-play moves spend their time.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_move_phases.py

Knobs: SP_WORKERS, SP_SIMS, SP_WAVE, SP_K, SP_RECYCLE, SP_BUDGET, REPS.
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
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.selfplay import SelfPlayActor, SelfPlayConfig

N = int(os.environ.get("BENCH_SIZE", 6))
B = int(os.environ.get("SP_WORKERS", 32))
SIMS = int(os.environ.get("SP_SIMS", 512))
WAVE = int(os.environ.get("SP_WAVE", 16))
K = int(os.environ.get("SP_K", 32))
RECYCLE = os.environ.get("SP_RECYCLE", "1") == "1"
BUDGET = int(os.environ.get("SP_BUDGET", 0)) or None
REPS = int(os.environ.get("REPS", 3))

engine = get_engine(N)
net = Network(engine)
variables = net.init_variables(0)
cfg = SelfPlayConfig(
    games=10**9, workers=B,
    search=SearchConfig(num_sims=SIMS, wave_size=WAVE, max_children=K,
                        recycle=RECYCLE, node_budget=BUDGET),
)
actor = SelfPlayActor(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
mcts = actor.mcts
print(f"B={B} sims={SIMS} wave={WAVE} k={K} recycle={RECYCLE} "
      f"backend={mcts._pallas_kind} nodes={actor.search_config.max_nodes}")

states = engine.initial_batch(B, 4)
states = actor._masked_step(states, jnp.zeros(B, jnp.int32), jnp.ones(B, bool))
states = actor._masked_step(
    states, jnp.full(B, engine.num_squares - 1, jnp.int32), jnp.ones(B, bool)
)
jrng = jax.random.PRNGKey(0)

from tak_tpu.mcts.tree import root_visit_counts

phases = {}


def timed(name, fn, *a, sync=None):
    t0 = time.perf_counter()
    out = fn(*a)
    probe = sync(out) if sync else out
    jax.device_get(jax.tree.leaves(probe)[0].ravel()[0])
    dt = time.perf_counter() - t0
    phases.setdefault(name, []).append(dt)
    return out


for rep in range(REPS + 1):
    if rep == 1:
        phases.clear()  # rep 0 = compile warmup
    tree = timed("init_batch", mcts.init_batch, states)
    tree = timed("prepare_root", mcts.prepare_root, variables, tree,
                 sync=lambda t: t.n0)
    jrng, k1, k2 = jax.random.split(jrng, 3)
    tree = timed("add_noise", mcts.add_noise, k1, tree, 0.2, 0.3,
                 jnp.ones(B, bool), sync=lambda t: t.root_prior)
    tree = timed("run_sims", mcts.run_sims, variables, tree,
                 sync=lambda t: t.n0)
    actions = timed("select_moves", mcts.select_moves, k2, tree,
                    jnp.ones(B, bool))
    # the fused move tail: visit compaction + snapshot + step + reroot +
    # next-move any-win, ONE device_get for everything (selfplay.py)
    t0 = time.perf_counter()
    (tree, new_states, sp_vals_d, sp_idx_d, nnz_d, snap_d, results_d,
     plies_d, any_win_d, next_free_d) = actor._move_bundle(
        tree, states, actions, jnp.ones(B, bool))
    got = jax.device_get((sp_vals_d, sp_idx_d, nnz_d, snap_d, results_d,
                          plies_d, any_win_d, next_free_d))
    phases.setdefault("move_bundle", []).append(time.perf_counter() - t0)

total = 0.0
for name, ts in phases.items():
    avg = sum(ts) / len(ts)
    total += avg
    print(f"  {name:18s} {avg * 1e3:8.1f} ms")
print(f"  {'TOTAL':18s} {total * 1e3:8.1f} ms/move "
      f"({B * SIMS / total:,.0f} sims/s)")
