"""Compare top-k strategies for [4096, 9036] -> top-64 on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BV = 4096
A = 9036
K = 64

rng = np.random.default_rng(0)
policy = jnp.asarray(rng.random((BV, A), np.float32))
# realistic legality: ~200 legal moves
legal = jnp.asarray(rng.random((BV, A)) < 0.025)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt * 1e3:8.2f} ms")
    return out


def masked(m, p):
    return jnp.where(m, p, -1.0)


timeit("exact f32", jax.jit(lambda m, p: jax.lax.top_k(masked(m, p), K)), legal, policy)
timeit("exact bf16", jax.jit(
    lambda m, p: jax.lax.top_k(masked(m, p).astype(jnp.bfloat16), K)), legal, policy)
timeit("approx default", jax.jit(
    lambda m, p: jax.lax.approx_max_k(masked(m, p), K)), legal, policy)
timeit("approx r=0.9", jax.jit(
    lambda m, p: jax.lax.approx_max_k(masked(m, p), K, recall_target=0.9)),
    legal, policy)
timeit("approx no-agg", jax.jit(
    lambda m, p: jax.lax.approx_max_k(masked(m, p), K, recall_target=0.9,
                                      aggregate_to_topk=False)), legal, policy)


# bisection threshold + compaction via one scatter
def bisect_topk(m, p):
    x = masked(m, p)
    lo = jnp.zeros((BV,), jnp.float32)
    hi = jnp.ones((BV,), jnp.float32)
    for _ in range(14):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(x >= mid[:, None], -1)
        too_many = cnt > K
        lo = jnp.where(too_many, mid, lo)
        hi = jnp.where(too_many, hi, mid)
    thr = lo  # at most K above thr's upper bisection... take >= hi? use lo
    sel = x >= hi[:, None]
    pos = jnp.cumsum(sel.astype(jnp.int32), -1) - 1
    pos = jnp.where(sel & (pos < K), pos, K)
    rows = jnp.broadcast_to(jnp.arange(BV)[:, None], (BV, A))
    vals = jnp.full((BV, K + 1), -1.0).at[rows, pos].max(x, mode="drop")
    aidx = jnp.full((BV, K + 1), 0, jnp.int32).at[rows, pos].max(
        jnp.broadcast_to(jnp.arange(A)[None, :], (BV, A)), mode="drop")
    return vals[:, :K], aidx[:, :K]


timeit("bisect+scatter", jax.jit(bisect_topk), legal, policy)


# compact legal ids then small top_k
def compact_topk(m, p):
    L = 512
    pos = jnp.cumsum(m.astype(jnp.int32), -1) - 1
    pos = jnp.where(m & (pos < L), pos, L)
    rows = jnp.broadcast_to(jnp.arange(BV)[:, None], (BV, A))
    ids = jnp.zeros((BV, L + 1), jnp.int32).at[rows, pos].max(
        jnp.broadcast_to(jnp.arange(A)[None, :], (BV, A)), mode="drop")
    ids = ids[:, :L]
    vals = jnp.take_along_axis(p, ids, axis=-1)
    cnt = jnp.sum(m, -1)
    valid = jnp.arange(L)[None, :] < cnt[:, None]
    v, i = jax.lax.top_k(jnp.where(valid, vals, -1.0), K)
    return v, jnp.take_along_axis(ids, i, axis=-1)


timeit("compact+small topk", jax.jit(compact_topk), legal, policy)
