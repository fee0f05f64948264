"""Exact top-K strategy shootout for the wave's [R, A] -> top-64 stage.

All variants are EXACT (any global top-K element is inside its block's
local top-K), unlike approx_max_k.  Usage:

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_topk3.py
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

R = int(os.environ.get("BENCH_FLAT", 4096))
A = 9036
K = int(os.environ.get("BENCH_MCTS_K", 64))

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((R, A), np.float32))


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt * 1e3:8.2f} ms")
    return out


base_vals, base_idx = timeit(
    "exact top_k k=64", jax.jit(lambda x: jax.lax.top_k(x, K)), x
)
timeit("exact top_k k=32", jax.jit(lambda x: jax.lax.top_k(x, 32)), x)
timeit("exact top_k k=16", jax.jit(lambda x: jax.lax.top_k(x, 16)), x)


def two_stage(x, c):
    """Exact: block top-K then merge.  Pad A to a multiple of c."""
    r = x.shape[0]
    pad = (-A) % c
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    w = (A + pad) // c
    blocks = xp.reshape(r * c, w)
    bv, bi = jax.lax.top_k(blocks, min(K, w))
    kk = bv.shape[-1]
    # global index = block * w + local
    gi = bi + (jnp.arange(r * c, dtype=jnp.int32)[:, None] % c) * w
    bv = bv.reshape(r, c * kk)
    gi = gi.reshape(r, c * kk)
    mv, mi = jax.lax.top_k(bv, K)
    return mv, jnp.take_along_axis(gi, mi, axis=-1)


for c in (2, 4, 8, 18):
    v, i = timeit(f"two-stage c={c}", jax.jit(lambda x, c=c: two_stage(x, c)), x)

# sort-128 variant: full sort of 128-wide blocks, keep top 64 of each
def sorted_blocks(x):
    pad = (-A) % 128
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    c = (A + pad) // 128
    blocks = xp.reshape(R * c, 128)
    idx = jnp.broadcast_to(jnp.arange(A + pad, dtype=jnp.int32), (R, A + pad))
    sv, si = jax.lax.sort_key_val(-blocks, idx.reshape(R * c, 128))
    sv = (-sv[:, :K]).reshape(R, c * K)
    si = si[:, :K].reshape(R, c * K)
    mv, mi = jax.lax.top_k(sv, K)
    return mv, jnp.take_along_axis(si, mi, axis=-1)


timeit("sort128 blocks + merge", jax.jit(sorted_blocks), x)

# correctness spot check (values only; ties may permute indices)
v2, i2 = jax.jit(lambda x: two_stage(x, 8))(x)
ok = np.allclose(np.asarray(base_vals), np.asarray(v2))
print("two-stage c=8 values match exact:", ok)
