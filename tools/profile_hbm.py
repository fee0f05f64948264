"""Time the HBM-edge-tier kernels vs the XLA path at self-play tree size.

Usage: PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_hbm.py
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

N = int(os.environ.get("HBM_SIZE", 6))
B = int(os.environ.get("HBM_BATCH", 32))          # self_play.rs:94 WORKERS=32
V = int(os.environ.get("HBM_WAVE", 8))
K = int(os.environ.get("HBM_K", 96))
SIMS = int(os.environ.get("HBM_SIMS", 64))        # short scan; budget is real
BUDGET = int(os.environ.get("HBM_BUDGET", 20002))  # 10k rollouts + reuse
BACKENDS = os.environ.get("HBM_BACKENDS", "pallas_hbm,xla").split(",")

engine = Engine(N)
net = Network(engine, NetConfig.for_size(N))
variables = net.init_variables(0)

roots = engine.initial_batch(B, 4)
roots = engine.batched_step(roots, jnp.zeros(B, jnp.int32))
roots = engine.batched_step(roots, jnp.full(B, engine.num_squares - 1, jnp.int32))

for backend in BACKENDS:
    cfg = SearchConfig(num_sims=SIMS, wave_size=V, max_children=K,
                       node_budget=BUDGET, backend=backend)
    mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
    print(f"[{backend}] kind={mcts._pallas_kind} waves={cfg.num_waves} "
          f"nodes={cfg.max_nodes}", flush=True)
    tree = mcts.init_batch(roots)
    tree = mcts.prepare_root(variables, tree)
    t0 = time.perf_counter()
    out = mcts.run_sims(variables, tree)
    jax.device_get(out.n0[0])
    print(f"[{backend}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mcts.run_sims(variables, tree)
        jax.device_get(out.n0[0])
    dt = (time.perf_counter() - t0) / reps
    sims = B * cfg.num_waves * V
    print(f"[{backend}] {dt * 1e3:8.1f} ms/search  {sims / dt:,.0f} sims/s "
          f"({dt / cfg.num_waves * 1e3:.2f} ms/wave)", flush=True)
