"""Control for the recycle quality guardrail: TV between two UNRELATED-
perturbation searches (no recycling anywhere) at deep sim budgets.

If two no-recycle searches that differ only in K (or an irrelevant
perturbation) already diverge strongly at 10k sims with an untrained
net, root-policy TV is a chaotic metric at this depth and the recycle
guardrail must be judged against this noise floor, not against zero.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
        python tools/quality_control.py --sims 10000 --games 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from quality_recycle import root_policies


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=10_000)
    ap.add_argument("--wave", type=int, default=16)
    ap.add_argument("--games", type=int, default=8)
    ap.add_argument("--plies", type=int, default=24)
    ap.add_argument("--size", type=int, default=6)
    ap.add_argument("--k-a", type=int, default=128)
    ap.add_argument("--k-b", type=int, default=128)
    ap.add_argument("--wave-b", type=int, default=None)
    args = ap.parse_args()

    from tak_tpu.engine.core import get_engine
    from tak_tpu.model.network import Network
    from tak_tpu.types import ONGOING

    engine = get_engine(args.size)
    net = Network(engine)
    variables = net.init_variables(0)

    states = engine.initial_batch(args.games, 4)
    rng = jax.random.PRNGKey(42)
    for _ in range(args.plies):
        rng, k_ = jax.random.split(rng)
        masks = jax.vmap(engine.legal_mask)(states)
        bits = jax.random.bits(k_, masks.shape, jnp.uint16)
        acts = jnp.argmax(jnp.where(masks, bits, jnp.uint16(0)), -1)
        nxt = engine.batched_step(states, acts.astype(jnp.int32))
        states = jax.tree.map(
            lambda new, old: jnp.where(
                (states.result == ONGOING).reshape(
                    (-1,) + (1,) * (new.ndim - 1)), new, old),
            nxt, states)

    budget = args.sims * 2 + 2
    p_a = root_policies(engine, net, variables, states, args.sims,
                        args.wave, k=args.k_a, budget=budget,
                        recycle=False, backend="pallas_hbm")
    p_b = root_policies(engine, net, variables, states, args.sims,
                        args.wave_b or args.wave, k=args.k_b, budget=budget,
                        recycle=False, backend="pallas_hbm")
    tv = 0.5 * np.abs(p_a - p_b).sum(-1)
    top1 = np.mean(p_a.argmax(-1) == p_b.argmax(-1))
    print(f"control: hbm K={args.k_a} wave {args.wave} vs hbm K={args.k_b} "
          f"wave {args.wave_b or args.wave} @ {args.sims} sims, "
          f"{args.games} positions:")
    print(f"  TV distance: mean {tv.mean():.4f}  max {tv.max():.4f}")
    print(f"  top-1 agreement: {top1:.3f}")


if __name__ == "__main__":
    main()
