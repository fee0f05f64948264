"""Differential tests: fused Pallas engine kernels vs the XLA engine.

Run in Pallas interpreter mode on CPU.  The XLA engine is itself pinned
to the reference by the perft/TPS/symmetry oracles, so exact agreement
here transfers that validation to the kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import Engine
from tak_tpu.engine.pallas_env import (
    build_env_rollout,
    build_fused_step,
    build_legal_sampler,
)
from tak_tpu.types import ONGOING

SIZES = [5, 6]
B = 8  # one kernel block


def random_playout_states(engine, steps, seed, batch=B, komi=3):
    """Drive `batch` games `steps` plies with the XLA engine, returning
    the state batch (mixed phases: opening/midgame/finished)."""
    rng = np.random.default_rng(seed)
    states = engine.initial_batch(batch, komi)
    for _ in range(steps):
        masks = np.asarray(jax.vmap(engine.legal_mask)(states))
        acts = np.zeros(batch, np.int32)
        for g in range(batch):
            legal = np.nonzero(masks[g])[0]
            acts[g] = rng.choice(legal) if len(legal) else 0
        states = engine.batched_step(states, jnp.asarray(acts))
    return states


def assert_states_equal(a, b, msg=""):
    for name in ("stacks", "heights", "tops", "to_move", "ply", "stones",
                 "caps", "half_komi", "reversible", "result"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_array_equal(av, bv, err_msg=f"{msg}: field {name}")


@pytest.mark.parametrize("n", SIZES)
def test_fused_step_playout_parity(n):
    """Random playouts: every ply, pallas fused step == XLA step, exactly."""
    engine = Engine(n)
    fused = build_fused_step(engine, block_g=B, interpret=True)
    rng = np.random.default_rng(100 + n)
    states = engine.initial_batch(B, 3)
    for ply in range(24):
        masks = np.asarray(jax.vmap(engine.legal_mask)(states))
        acts = np.zeros(B, np.int32)
        for g in range(B):
            legal = np.nonzero(masks[g])[0]
            acts[g] = rng.choice(legal) if len(legal) else 0
        ref = engine.batched_step(states, jnp.asarray(acts))
        got = fused(states, jnp.asarray(acts))
        assert_states_equal(got, ref, f"n={n} ply={ply}")
        states = ref


@pytest.mark.parametrize("n", SIZES)
def test_fused_step_freezes_done_and_disabled(n):
    engine = Engine(n)
    fused = build_fused_step(engine, block_g=B, interpret=True)
    states = random_playout_states(engine, 30, seed=7 + n)
    acts = jnp.zeros(B, jnp.int32)
    enabled = jnp.asarray([True, False] * (B // 2))
    ref = engine.batched_step_masked(states, acts, enabled)
    got = fused(states, acts, enabled)
    assert_states_equal(got, ref, f"n={n} freeze")


@pytest.mark.parametrize("n", SIZES)
def test_fused_step_legal_parity(n):
    """step+legal kernel == XLA step followed by XLA legal_mask, exactly
    (including frozen finished/disabled games); the fused masked-top-k
    over the packed words == top_k(where(legal, policy, -1))."""
    from tak_tpu.engine.pallas_env import (
        build_fused_step_legal, masked_topk_packed, unpack_legal,
    )

    engine = Engine(n)
    fused = build_fused_step_legal(engine, block_g=B, interpret=True)
    rng = np.random.default_rng(400 + n)
    states = engine.initial_batch(B, 3)
    K = 16
    for ply in range(12):
        masks = np.asarray(jax.vmap(engine.legal_mask)(states))
        acts = np.zeros(B, np.int32)
        for g in range(B):
            legal = np.nonzero(masks[g])[0]
            acts[g] = rng.choice(legal) if len(legal) else 0
        enabled = jnp.asarray(rng.random(B) < 0.9)
        ref = engine.batched_step_masked(states, jnp.asarray(acts), enabled)
        ref_legal = np.asarray(jax.vmap(engine.legal_mask)(ref))
        got, place, spread = fused(states, jnp.asarray(acts), enabled)
        assert_states_equal(got, ref, f"n={n} ply={ply}")
        np.testing.assert_array_equal(
            np.asarray(unpack_legal(engine, place, spread)), ref_legal,
            err_msg=f"n={n} ply={ply} legal",
        )
        policy = jnp.asarray(
            rng.random((B, engine.num_actions)).astype(np.float32)
        )
        rv, ri = jax.lax.top_k(jnp.where(ref_legal, policy, -1.0), K)
        gv, gi = masked_topk_packed(engine, policy, place, spread, K)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=0,
                                   err_msg=f"n={n} ply={ply} topk vals")
        # indices must agree wherever the value is legal (>= 0)
        sel = np.asarray(rv) >= 0
        np.testing.assert_array_equal(
            np.asarray(gi)[sel], np.asarray(ri)[sel],
            err_msg=f"n={n} ply={ply} topk idx",
        )
        states = engine.batched_step(states, jnp.asarray(acts))


@pytest.mark.parametrize("n", SIZES + [7, 8])
@pytest.mark.parametrize("plies", [0, 1, 9, 40])
def test_sampler_legal_and_counts(n, plies):
    """Sampled actions are legal; reported totals equal the legal count."""
    engine = Engine(n)
    sampler = build_legal_sampler(
        engine, block_g=B, interpret=True, external_bits=True
    )
    states = random_playout_states(engine, plies, seed=31 + n + plies)
    masks = np.asarray(jax.vmap(engine.legal_mask)(states))
    results = np.asarray(states.result)
    bits = np.random.default_rng(5).integers(0, 2**32, B, dtype=np.uint64)
    acts, tots = sampler(states, jnp.asarray(bits.astype(np.uint32)))
    acts, tots = np.asarray(acts), np.asarray(tots)
    for g in range(B):
        assert tots[g] == masks[g].sum(), (n, plies, g)
        if results[g] == ONGOING and tots[g] > 0:
            assert masks[g][acts[g]], (n, plies, g, acts[g])


@pytest.mark.slow
@pytest.mark.parametrize("n", SIZES)
def test_sampler_uniform_over_legal(n):
    """With exhaustive bit values, every legal action of a position is
    sampled, with near-uniform frequency (exact r = bits % total)."""
    engine = Engine(n)
    sampler = build_legal_sampler(
        engine, block_g=B, interpret=True, external_bits=True
    )
    states = random_playout_states(engine, 6, seed=77 + n)
    masks = np.asarray(jax.vmap(engine.legal_mask)(states))
    tot0 = int(masks[0].sum())
    legal0 = set(np.nonzero(masks[0])[0].tolist())
    seen = set()
    for r in range(tot0):
        bits = jnp.full((B,), r, jnp.uint32)
        acts, _ = sampler(states, bits)
        seen.add(int(np.asarray(acts)[0]))
    assert seen == legal0


@pytest.mark.parametrize("n", [6, 7])
def test_rollout_matches_scripted_xla_loop(n):
    """T-step rollout with injected bits == XLA loop replaying the same
    sampling rule (r = bits % n_legal over the canonical group order)."""
    engine = Engine(n)
    T = 12
    rollout = build_env_rollout(
        engine, T, block_g=B, interpret=True, external_bits=True
    )
    sampler = build_legal_sampler(
        engine, block_g=B, interpret=True, external_bits=True
    )
    rng = np.random.default_rng(n)
    bits = rng.integers(0, 2**32, (T, B), dtype=np.uint64).astype(np.uint32)

    states = random_playout_states(engine, 4, seed=13 * n)
    got = rollout(states, jnp.asarray(bits))

    # reference: sampler kernel (validated above) + XLA step + reset
    ref = states
    fresh = engine.initial(np.asarray(states.half_komi)[0].item())
    for t in range(T):
        acts, _ = sampler(ref, jnp.asarray(bits[t]))
        ref = engine.batched_step(ref, acts)
        done = np.asarray(ref.result) != ONGOING
        ref = jax.tree.map(
            lambda cur, init: jnp.where(
                jnp.asarray(done).reshape((-1,) + (1,) * (cur.ndim - 1)),
                jnp.broadcast_to(init, cur.shape),
                cur,
            ),
            ref,
            fresh,
        )
    assert_states_equal(got, ref, f"n={n} rollout")
