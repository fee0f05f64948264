"""Time the MCTS tree kernels in isolation (descend / expand_backup /
merged backup_descend) on the chip.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_kernels.py
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

N = int(os.environ.get("BENCH_SIZE", 6))
B = int(os.environ.get("BENCH_MCTS_BATCH", 256))
V = int(os.environ.get("BENCH_MCTS_WAVE", 16))
K = int(os.environ.get("BENCH_MCTS_K", 64))
SIMS = int(os.environ.get("BENCH_MCTS_SIMS", 512))

engine = Engine(N)
net = Network(engine)
variables = net.init_variables(0)
cfg = SearchConfig(num_sims=SIMS, wave_size=V, max_children=K)
mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)

roots = engine.initial_batch(B, 4)
roots = engine.batched_step(roots, jnp.zeros(B, jnp.int32))
roots = engine.batched_step(roots, jnp.full(B, engine.num_squares - 1, jnp.int32))
tree = mcts.init_batch(roots)
tree = mcts.prepare_root(variables, tree)
print("kind:", mcts._pallas_kind, "max_nodes:", cfg.max_nodes)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return out, dt


descend = jax.jit(lambda t: mcts._descend(t))
(tree_d, leaves, created), _ = timeit("descend", descend, tree)

# realistic pending payload from one real wave
tree_e, pending = jax.jit(
    lambda p, t, l, c: mcts._eval_and_topk(p, t, l, c)
)(variables, tree_d, leaves, created)

eb = jax.jit(lambda t, pn: mcts._expand_backup(t, *pn))
timeit("expand_backup", eb, tree_e, pending)

bd = jax.jit(lambda t, pn: mcts._backup_descend(t, pn + (jnp.int32(1),)))
timeit("merged backup+descend", bd, tree_e, pending)
