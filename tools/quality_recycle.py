"""Quality guardrail: root-policy divergence of node recycling.

Compares normalized root visit distributions between a bounded recycled
pool (VMEM kernel tier) and an unbounded pool at the SAME sim budget,
over random midgame positions — the VERDICT guardrail for replacing the
HBM tier with recycling in production self-play.

On chip (deep sims are impractical on CPU):

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
        python tools/quality_recycle.py --sims 10000 --games 8

The reference run defaults to the HBM tier at K=128 (the round-2
production config); the candidate to the recycled 1280-node pool.
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


def root_policies(engine, net, variables, states, sims, wave, *, k, budget,
                  recycle, backend, chunk=None):
    from tak_tpu.mcts.search import MCTS, SearchConfig
    from tak_tpu.mcts.tree import root_visit_counts

    cfg = SearchConfig(num_sims=sims, wave_size=wave, max_children=k,
                       node_budget=budget, recycle=recycle, backend=backend,
                       scan_chunk=chunk)
    mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(variables, tree)
    tree = mcts.run_sims(variables, tree)
    visits = jax.vmap(root_visit_counts)(tree)
    v = np.asarray(jax.device_get(visits), np.float64)
    return v / np.maximum(v.sum(-1, keepdims=True), 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=10_000)
    ap.add_argument("--wave", type=int, default=16)
    ap.add_argument("--cand-wave", type=int, default=None,
                    help="candidate wave size (default: same as --wave)")
    ap.add_argument("--games", type=int, default=8)
    ap.add_argument("--plies", type=int, default=24)
    ap.add_argument("--size", type=int, default=6)
    ap.add_argument("--budget", type=int, default=1280)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--ref-k", type=int, default=128)
    ap.add_argument("--ref-backend", default="pallas_hbm")
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

    p_ref = root_policies(
        engine, net, variables, states, args.sims, args.wave,
        k=args.ref_k, budget=args.sims * 2 + 2, recycle=False,
        backend=args.ref_backend,
    )
    cand_wave = args.cand_wave or args.wave
    p_rec = root_policies(
        engine, net, variables, states, args.sims, cand_wave,
        k=args.k, budget=args.budget, recycle=True, backend="pallas",
        chunk=512,
    )
    tv = 0.5 * np.abs(p_ref - p_rec).sum(-1)
    top1 = np.mean(p_ref.argmax(-1) == p_rec.argmax(-1))
    print(f"recycled pool {args.budget} K={args.k} wave {cand_wave} vs "
          f"{args.ref_backend} K={args.ref_k} wave {args.wave} @ "
          f"{args.sims} sims, {args.games} positions (ply {args.plies}):")
    print(f"  TV distance: mean {tv.mean():.4f}  max {tv.max():.4f}")
    print(f"  top-1 agreement: {top1:.3f}")


if __name__ == "__main__":
    main()
