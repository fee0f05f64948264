"""Fused engine kernels at 7x7/8x8 (3- and 4-word stacks).

The two-word kernels were generalized to W word planes (pallas_env
`_nwords`); the reference supports N=3..8 uniformly (tak/src/game.rs:
10-20).  Random playouts rarely build stacks past one word, so besides
playout parity this adds SYNTHETIC tall-stack states whose spreads and
insertions cross the 32/64/96-bit word boundaries — the code paths that
do not exist at sizes 3-6.  Oracle: the XLA engine (itself pinned by
perft + native C++ differentials).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import Engine
from tak_tpu.engine.pallas_env import (
    build_fused_step,
    build_fused_step_legal,
    unpack_legal,
)
from tak_tpu.types import CAP, FLAT, WALL, GameState

B = 8


def assert_states_equal(a, b, msg=""):
    for name in ("stacks", "heights", "tops", "to_move", "ply", "stones",
                 "caps", "half_komi", "reversible", "result"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_array_equal(av, bv, err_msg=f"{msg}: field {name}")


@pytest.mark.parametrize("n", [7, 8])
def test_playout_parity_78(n):
    engine = Engine(n)
    fused = build_fused_step(engine, block_g=B, interpret=True)
    rng = np.random.default_rng(700 + n)
    states = engine.initial_batch(B, 3)
    for ply in range(16):
        masks = np.asarray(jax.vmap(engine.legal_mask)(states))
        acts = np.zeros(B, np.int32)
        for g in range(B):
            legal = np.nonzero(masks[g])[0]
            acts[g] = rng.choice(legal) if len(legal) else 0
        ref = engine.batched_step(states, jnp.asarray(acts))
        got = fused(states, jnp.asarray(acts))
        assert_states_equal(got, ref, f"n={n} ply={ply}")
        states = ref


def tall_stack_states(engine, heights_at_center, seed):
    """Synthetic batch: a tall mover-owned stack at the center square,
    scattered small stacks elsewhere.  Bits above each height are zero
    (an engine invariant); otherwise random colors.  Unreachable by play
    but both engines are pure functions of the state, so differential
    equality is still meaningful."""
    n, n2, W = engine.n, engine.num_squares, engine.words
    rng = np.random.default_rng(seed)
    Bq = len(heights_at_center)
    center = (n // 2) * n + n // 2

    heights = rng.integers(0, 3, (Bq, n2)).astype(np.int32)
    stacks = np.zeros((Bq, n2, W), np.uint64)
    tops = np.zeros((Bq, n2), np.int32)
    for b in range(Bq):
        heights[b, center] = heights_at_center[b]
        for q in range(n2):
            h = int(heights[b, q])
            full = rng.integers(0, 2 ** 32, W, dtype=np.uint64)
            for j in range(W):
                lo = 32 * j
                keep = max(0, min(32, h - lo))
                full[j] &= (np.uint64(1) << np.uint64(keep)) - np.uint64(1)
            stacks[b, q] = full
            if h > 0:
                tops[b, q] = int(rng.choice([FLAT, FLAT, WALL, CAP]))
        # mover owns the center stack top (so spreads from it are legal)
        h = int(heights[b, center])
        j, o = (h - 1) // 32, (h - 1) % 32
        stacks[b, center, j] &= ~(np.uint64(1) << np.uint64(o))
        tops[b, center] = FLAT

    return GameState(
        stacks=jnp.asarray(stacks.astype(np.uint32)),
        heights=jnp.asarray(heights),
        tops=jnp.asarray(tops),
        to_move=jnp.zeros(Bq, jnp.int32),
        ply=jnp.full(Bq, 20, jnp.int32),
        stones=jnp.full((Bq, 2), 10, jnp.int32),
        caps=jnp.ones((Bq, 2), jnp.int32),
        half_komi=jnp.full(Bq, 4, jnp.int32),
        reversible=jnp.zeros(Bq, jnp.int32),
        result=jnp.zeros(Bq, jnp.int32),
    )


@pytest.mark.parametrize("n,hs", [
    (7, [30, 33, 40, 62, 65, 70, 80, 33]),
    (8, [31, 34, 63, 66, 90, 95, 97, 100]),
])
def test_tall_stack_step_and_legal_parity(n, hs):
    """Spreads from / placements onto stacks spanning words 1-3."""
    engine = Engine(n)
    fused = build_fused_step_legal(engine, block_g=B, interpret=True)
    states = tall_stack_states(engine, hs, seed=n)

    masks = np.asarray(jax.vmap(engine.legal_mask)(states))
    rng = np.random.default_rng(5 + n)
    # several rounds so different spread patterns / squares get hit
    for round_ in range(6):
        acts = np.zeros(B, np.int32)
        for g in range(B):
            legal = np.nonzero(masks[g])[0]
            # bias toward spread actions (they exercise the carry window)
            spreads = legal[legal >= 3 * engine.num_squares]
            pool = spreads if (len(spreads) and rng.random() < 0.8) else legal
            acts[g] = rng.choice(pool) if len(pool) else 0
        ref = engine.batched_step(states, jnp.asarray(acts))
        ref_legal = np.asarray(jax.vmap(engine.legal_mask)(ref))
        got, place, spread = fused(states, jnp.asarray(acts))
        assert_states_equal(got, ref, f"n={n} round={round_}")
        np.testing.assert_array_equal(
            np.asarray(unpack_legal(engine, place, spread)), ref_legal,
            err_msg=f"n={n} round={round_} legal",
        )
        states, masks = ref, ref_legal
