"""NN forward formulation shootout on the chip.

Compares the flax/XLA conv tower against manual matmul formulations of
the same 3x3 convs (the board is 6x6, so conv lowering overheads can
dominate).  All variants compute the same function (bitwise may differ
by accumulation order only).

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_nn.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

N = 6
B = int(os.environ.get("BENCH_FLAT", 4096))
C = 128
BLOCKS = 16
CIN = 92
A_OUT = 251

rng = np.random.default_rng(0)
bf16 = jnp.bfloat16

x0 = jnp.asarray(rng.standard_normal((B, N, N, CIN), np.float32), bf16)
w_stem = jnp.asarray(rng.standard_normal((3, 3, CIN, C), np.float32) * 0.05, bf16)
ws = jnp.asarray(
    rng.standard_normal((2 * BLOCKS, 3, 3, C, C), np.float32) * 0.05, bf16
)
w_pol = jnp.asarray(rng.standard_normal((3, 3, C, A_OUT), np.float32) * 0.05, bf16)
w_val = jnp.asarray(rng.standard_normal((N * N * C, 1), np.float32) * 0.05, bf16)


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


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(bf16)


def tower_xla(x):
    x = conv_xla(x, w_stem)
    x = jax.nn.relu(x)
    for i in range(BLOCKS):
        y = jax.nn.relu(conv_xla(x, ws[2 * i]))
        y = conv_xla(y, ws[2 * i + 1])
        x = jax.nn.relu(x + y)
    p = conv_xla(x, w_pol)
    v = jnp.tanh((x.reshape(B, -1) @ w_val).astype(jnp.float32))
    return p, v


def conv_mm(x, w):
    """3x3 SAME conv as 9 shifted matmuls accumulated in f32.

    x [B, N, N, Cin]; w [3, 3, Cin, Cout].
    """
    Bx, n, _, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((Bx, n, n, w.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + n, dx : dx + n, :]
            acc = acc + jax.lax.dot_general(
                patch.reshape(-1, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Bx, n, n, -1)
    return acc.astype(bf16)


def tower_mm(x):
    x = jax.nn.relu(conv_mm(x, w_stem))
    for i in range(BLOCKS):
        y = jax.nn.relu(conv_mm(x, ws[2 * i]))
        y = conv_mm(y, ws[2 * i + 1])
        x = jax.nn.relu(x + y)
    p = conv_mm(x, w_pol)
    v = jnp.tanh((x.reshape(B, -1) @ w_val).astype(jnp.float32))
    return p, v


def conv_im2col(x, w):
    """3x3 SAME conv as one big [B*36, 9*Cin] x [9*Cin, Cout] matmul."""
    Bx, n, _, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [
            xp[:, dy : dy + n, dx : dx + n, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )  # [B, n, n, 9*cin]
    out = jax.lax.dot_general(
        cols.reshape(-1, 9 * cin), w.reshape(9 * cin, -1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(Bx, n, n, -1).astype(bf16)


def tower_im2col(x):
    x = jax.nn.relu(conv_im2col(x, w_stem))
    for i in range(BLOCKS):
        y = jax.nn.relu(conv_im2col(x, ws[2 * i]))
        y = conv_im2col(y, ws[2 * i + 1])
        x = jax.nn.relu(x + y)
    p = conv_im2col(x, w_pol)
    v = jnp.tanh((x.reshape(B, -1) @ w_val).astype(jnp.float32))
    return p, v


def conv_mm_i8(x_i8, w_i8):
    """int8 conv: 9 shifted int8 matmuls, int32 accumulation."""
    Bx, n, _, cin = x_i8.shape
    xp = jnp.pad(x_i8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((Bx, n, n, w_i8.shape[-1]), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + n, dx : dx + n, :]
            acc = acc + jax.lax.dot_general(
                patch.reshape(-1, cin), w_i8[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(Bx, n, n, -1)
    return acc


def tower_i8(x):
    # toy quantization: fixed scales, requantize to int8 between layers
    def q(v):
        return jnp.clip(jnp.round(v * 16.0), -127, 127).astype(jnp.int8)

    xq = q(x.astype(jnp.float32))
    wq_stem = q(w_stem.astype(jnp.float32) * 8)
    wqs = q(ws.astype(jnp.float32) * 8)
    xi = conv_mm_i8(xq, wq_stem)
    xq = jnp.clip(xi >> 7, -127, 127).astype(jnp.int8)
    for i in range(BLOCKS):
        yi = conv_mm_i8(xq, wqs[2 * i])
        yq = jnp.clip(yi >> 7, -127, 127).astype(jnp.int8)
        yi = conv_mm_i8(yq, wqs[2 * i + 1])
        xq = jnp.clip((yi >> 7) + xq, -127, 127).astype(jnp.int8)
    p = conv_mm_i8(xq, q(w_pol.astype(jnp.float32) * 8))
    v = jnp.tanh((xq.reshape(B, -1).astype(bf16) @ w_val).astype(jnp.float32))
    return p, v


timeit("tower XLA conv (bf16)", jax.jit(tower_xla), x0)
timeit("tower 9-shift matmul (bf16)", jax.jit(tower_mm), x0)
timeit("tower im2col matmul (bf16)", jax.jit(tower_im2col), x0)
timeit("tower int8 9-shift matmul", jax.jit(tower_i8), x0)

# numeric sanity: matmul formulations agree with XLA conv
p1, _ = jax.jit(tower_xla)(x0)
p2, _ = jax.jit(tower_mm)(x0)
p3, _ = jax.jit(tower_im2col)(x0)
d12 = float(jnp.max(jnp.abs(p1.astype(jnp.float32) - p2.astype(jnp.float32))))
d13 = float(jnp.max(jnp.abs(p1.astype(jnp.float32) - p3.astype(jnp.float32))))
print(f"max|xla - mm| = {d12:.4f}  max|xla - im2col| = {d13:.4f}")
