"""Micro-timings for wave sub-components on the chip."""

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

N = 6
BV = 4096
K = 64

engine = Engine(N)

states = engine.initial_batch(BV, 4)
states = engine.batched_step(states, jnp.zeros(BV, jnp.int32))
states = engine.batched_step(states, jnp.full(BV, engine.num_squares - 1, jnp.int32))


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt * 1e3:8.2f} ms")
    return out, dt


legal_j = jax.jit(jax.vmap(engine.legal_mask))
legal, _ = timeit("legal_mask", legal_j, states)

import numpy as np
policy = jnp.asarray(np.random.rand(BV, engine.num_actions).astype(np.float32))

topk_j = jax.jit(lambda m, p: jax.lax.top_k(jnp.where(m, p, -1.0), K))
timeit("topk exact", topk_j, legal, policy)

approx_j = jax.jit(lambda m, p: jax.lax.approx_max_k(jnp.where(m, p, -1.0), K))
timeit("topk approx", approx_j, legal, policy)

actions = jnp.argmax(jnp.where(legal, policy, -1.0), -1).astype(jnp.int32)

step_nores = jax.jit(jax.vmap(lambda s, a: engine.step(s, a)))
stepped, _ = timeit("step (incl result)", step_nores, states, actions)

res_j = jax.jit(jax.vmap(engine.compute_result))
timeit("compute_result (roads)", res_j, stepped)

roads_j = jax.jit(jax.vmap(engine.roads))
timeit("roads alone", roads_j, stepped)

obs_j = jax.jit(jax.vmap(lambda s: __import__("tak_tpu.engine.observe", fromlist=["observe"]).observe(engine, s)))
timeit("observe", obs_j, states)
