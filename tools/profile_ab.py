"""Single-process A/B of full run_sims searches across search configs.

Measures whole searches (init + prepare_root excluded; run_sims only),
interleaved A/B/A/B to cancel thermal / tunnel drift, reporting sims/s
per variant.  Usage:

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_ab.py
"""

import dataclasses
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
ROUNDS = int(os.environ.get("BENCH_AB_ROUNDS", 3))

engine = Engine(N)
net = Network(engine)
variables = net.init_variables(0)
eval_fn = lambda p, s: net.policy_eval_states(p, s)

base = SearchConfig(num_sims=SIMS, wave_size=V, max_children=K)
# BENCH_AB picks the variant pair: each entry is name -> config overrides
PAIRS = {
    "fused-legal": {
        "fused-legal": dict(fused_leaf_legal=True),
        "xla-legal": dict(fused_leaf_legal=False),
    },
    "topk": {
        "topk-packed": dict(topk_impl="packed"),
        "topk-exact": dict(topk_impl="exact"),
    },
    "topkq": {
        "topk-packedq": dict(topk_impl="packedq"),
        "topk-exact": dict(topk_impl="exact"),
    },
}
_pair = os.environ.get("BENCH_AB", "topk")
if _pair not in PAIRS:
    raise SystemExit(
        f"unknown BENCH_AB={_pair!r}; valid pairs: {', '.join(sorted(PAIRS))}"
    )
VARIANTS = {
    name: dataclasses.replace(base, **kw)
    for name, kw in PAIRS[_pair].items()
}

states = engine.initial_batch(B, 4)
states = engine.batched_step(states, jnp.zeros(B, jnp.int32))
states = engine.batched_step(states, jnp.full(B, engine.num_squares - 1, jnp.int32))

searchers = {}
for name, cfg in VARIANTS.items():
    m = MCTS(engine, eval_fn, cfg)
    tree = m.init_batch(states)
    tree = m.prepare_root(variables, tree)
    searchers[name] = (m, tree)
    out = m.run_sims(variables, tree)
    jax.device_get(out.n0[0])  # compile + warmup
    print(f"{name}: compiled (kind={m._pallas_kind})")

times = {name: 0.0 for name in VARIANTS}
for r in range(ROUNDS):
    for name, (m, tree) in searchers.items():
        t0 = time.perf_counter()
        out = m.run_sims(variables, tree)
        jax.device_get(out.n0[0])
        times[name] += time.perf_counter() - t0

sims = B * base.num_waves * V * ROUNDS
for name, t in times.items():
    print(f"{name:14s} {t / ROUNDS * 1e3:9.1f} ms/search   {sims / t:,.0f} sims/s")
