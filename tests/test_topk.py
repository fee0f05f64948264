"""masked_topk: packed int32 selection vs the exact f32 reference.

The packed impl quantizes priors to q_bits when building its sort keys
but gathers the EXACT f32 values by index, so with quantization-distinct
inputs it must match "exact" bit for bit (including pad slots when there
are fewer legal actions than K).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.mcts.search import MCTS, SearchConfig, masked_topk


def _distinct_policy(rng, rows, a, q_bits=17):
    """Rows of [0,1] values that are all distinct after q_bits rounding."""
    scale = (1 << q_bits) - 1
    qs = np.stack([
        rng.choice(scale + 1, size=a, replace=False) for _ in range(rows)
    ])
    return qs.astype(np.float64) / scale


@pytest.mark.parametrize("a,k", [(9036, 32), (1575, 17), (300, 8)])
def test_packed_matches_exact(a, k):
    rng = np.random.default_rng(0)
    rows = 4
    policy = jnp.asarray(_distinct_policy(rng, rows, a), jnp.float32)
    legal = jnp.asarray(rng.random((rows, a)) < 0.03)

    ve, ie = jax.jit(lambda p, l: masked_topk(p, l, k, "exact"))(policy, legal)
    vp, ip = jax.jit(lambda p, l: masked_topk(p, l, k, "packed"))(policy, legal)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(vp))
    # pad slots (vals == -1) may carry different index sentinels
    sel = np.asarray(ve) >= 0.0
    np.testing.assert_array_equal(
        np.asarray(ie)[sel], np.asarray(ip)[sel]
    )


def test_packed_pad_slots():
    # fewer legal entries than K: pads must be vals=-1 / masked out
    a, k = 512, 16
    rng = np.random.default_rng(1)
    policy = jnp.asarray(_distinct_policy(rng, 2, a), jnp.float32)
    legal = jnp.zeros((2, a), bool).at[:, [3, 100, 511]].set(True)
    vp, ip = masked_topk(policy, legal, k, "packed")
    vp, ip = np.asarray(vp), np.asarray(ip)
    assert (vp[:, 3:] == -1.0).all()
    assert (vp[:, :3] >= 0).all()
    # selected ids are exactly the legal ones, best-first
    for r in range(2):
        got = set(ip[r, :3].tolist())
        assert got == {3, 100, 511}
        assert (np.diff(vp[r, :3]) <= 0).all()


def test_zero_prior_legal_still_selected():
    # a legal action with prior 0.0 must beat an illegal slot
    policy = jnp.zeros((1, 256), jnp.float32)
    legal = jnp.zeros((1, 256), bool).at[0, 7].set(True)
    vp, ip = masked_topk(policy, legal, 4, "packed")
    assert float(vp[0, 0]) == 0.0 and int(ip[0, 0]) == 7
    assert (np.asarray(vp)[0, 1:] == -1.0).all()


def test_topk_impl_resolution():
    from tak_tpu.engine.core import get_engine
    from tak_tpu.model.network import Network

    engine = get_engine(5)
    net = Network(engine)
    eval_fn = lambda p, s: net.policy_eval_states(p, s)
    cfg = SearchConfig(num_sims=8, wave_size=4, topk_impl="auto")
    m = MCTS(engine, eval_fn, cfg)
    assert m._topk_impl == ("exact" if jax.default_backend() == "cpu"
                            else "packedq")
    m2 = MCTS(engine, eval_fn, SearchConfig(num_sims=8, topk_impl="packed"))
    assert m2._topk_impl == "packed"
    with pytest.raises(ValueError):
        MCTS(engine, eval_fn, SearchConfig(num_sims=8, topk_impl="bogus"))
