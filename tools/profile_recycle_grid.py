"""Grid of run_sims throughput vs (node_budget, wave_size, scan_chunk).

Finds where the recycled VMEM tier's per-wave cost goes at the
reference self-play config (B=32 workers, 10k rollouts): pool size
(tree-array bandwidth), wave size (launch amortization), and chunk
host-loop overhead.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_recycle_grid.py
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

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import MCTS, SearchConfig
from tak_tpu.model.network import Network

N = int(os.environ.get("BENCH_SIZE", 6))
B = int(os.environ.get("SP_WORKERS", 32))
SIMS = int(os.environ.get("SP_SIMS", 10000))

engine = get_engine(N)
net = Network(engine)
variables = net.init_variables(0)

roots = engine.initial_batch(B, 4)
roots = engine.batched_step(roots, jnp.zeros(B, jnp.int32))
roots = engine.batched_step(
    roots, jnp.full(B, engine.num_squares - 1, jnp.int32))

import ast
configs = ast.literal_eval(os.environ.get(
    "GRID", "[(1280,16,512),(768,16,512)]"))

for tup in configs:
    budget, wave, chunk = tup[:3]
    rec = bool(tup[3]) if len(tup) > 3 else True
    cfg = SearchConfig(num_sims=SIMS, wave_size=wave, max_children=32,
                       recycle=rec, node_budget=budget,
                       scan_chunk=chunk or None)
    mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
    tree = mcts.init_batch(roots)
    tree = mcts.prepare_root(variables, tree)
    t_c0 = time.perf_counter()
    out = mcts.run_sims(variables, tree)
    jax.device_get(out.n0[0])
    t_compile = time.perf_counter() - t_c0
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mcts.run_sims(variables, tree)
        jax.device_get(out.n0[0])
    dt = (time.perf_counter() - t0) / reps
    rate = B * SIMS / dt
    print(f"budget={budget:5d} wave={wave:3d} chunk={chunk:5d} rec={int(rec)} "
          f"{dt*1e3:9.1f} ms/search  {rate/1e3:7.1f}k sims/s "
          f"(first call {t_compile:.1f}s)", flush=True)
