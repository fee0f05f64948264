"""Micro-profile of the wave's legal+topk stage and alternatives.

Usage: PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_topk2.py
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

N = int(os.environ.get("BENCH_SIZE", 6))
B = int(os.environ.get("BENCH_FLAT", 4096))  # flat leaf count (B*V)
K = int(os.environ.get("BENCH_MCTS_K", 64))

engine = Engine(N)
A = engine.num_actions

states = engine.initial_batch(B, 4)
states = engine.batched_step(states, jnp.zeros(B, jnp.int32))
states = engine.batched_step(states, jnp.full(B, engine.num_squares - 1, jnp.int32))
policy = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(0), (B, A)), axis=-1
)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return out


legal_j = jax.jit(lambda s: jax.vmap(engine.legal_mask)(s))
legal = timeit("legal_mask", legal_j, states)

topk_j = jax.jit(lambda lg, p: jax.lax.top_k(jnp.where(lg, p, -1.0), K))
timeit("exact top_k", topk_j, legal, policy)

ap_j = jax.jit(
    lambda lg, p: jax.lax.approx_max_k(
        jnp.where(lg, p, -1.0), K, recall_target=0.95
    )
)
timeit("approx_max_k r=0.95", ap_j, legal, policy)

ap99_j = jax.jit(
    lambda lg, p: jax.lax.approx_max_k(
        jnp.where(lg, p, -1.0), K, recall_target=0.99
    )
)
timeit("approx_max_k r=0.99", ap99_j, legal, policy)

# exactness check vs legal count: recall of true top-K legal actions
v_e, i_e = topk_j(legal, policy)
v_a, i_a = ap99_j(legal, policy)
import numpy as np

ie = np.asarray(jax.device_get(i_e))
ia = np.asarray(jax.device_get(i_a))
rec = np.mean([len(set(ie[b]) & set(ia[b])) / K for b in range(min(B, 256))])
print(f"approx r=0.99 measured recall vs exact: {rec:.4f}")

# fused leaf step already emits stepped states; can it emit legal too?
fused = engine.fused_step_fn(block_g=128)
acts = jnp.zeros(B, jnp.int32)
en = jnp.ones(B, bool)
timeit("fused_step (for reference)", fused, states, acts, en)

# packed-key top_k: quantize prob to 17 bits, pack index into low 14 bits,
# single i32 top_k (no co-sorted payload)
def packed_topk(lg, p):
    q = jnp.round(p * 131071.0).astype(jnp.int32)
    key = jnp.where(lg, (q << 14) | jax.lax.broadcasted_iota(jnp.int32, p.shape, 1), jnp.int32(-(1 << 31)))
    top, _ = jax.lax.top_k(key, K)
    idx = top & 16383
    vals = jnp.where(top >= 0, (top >> 14).astype(jnp.float32) / 131071.0, -1.0)
    return vals, idx

pk_j = jax.jit(packed_topk)
timeit("packed i32 top_k", pk_j, legal, policy)

v_p, i_p = pk_j(legal, policy)
ip = np.asarray(jax.device_get(i_p))
recp = np.mean([len(set(ie[b]) & set(ip[b])) / K for b in range(min(B, 256))])
print(f"packed topk recall vs exact: {recp:.4f}")
vp = np.asarray(jax.device_get(v_p))
ve = np.asarray(jax.device_get(v_e))
print(f"packed topk max |prior err|: {np.abs(np.sort(vp,1)-np.sort(ve,1)).max():.2e}")

# bf16 top_k for comparison
bf_j = jax.jit(lambda lg, p: jax.lax.top_k(jnp.where(lg, p, -1.0).astype(jnp.bfloat16), K))
timeit("bf16 top_k", bf_j, legal, policy)
