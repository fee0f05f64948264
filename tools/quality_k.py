"""Quality probe: root-policy divergence of edge truncation K vs full width.

Children of non-root nodes keep only the top-K priors (mcts/tree.py); the
reference stores all legal children.  This measures what that truncation
does to the search result: total-variation distance between normalized
root visit distributions (the training target / move-selection input) at
`K` vs a full-width run, over random midgame positions, same seeds.

Runs on CPU (XLA descent backend — K semantics are backend-independent):

    python tools/quality_k.py --k 16 --ref-k 96 --sims 512 --games 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def root_policies(engine, net, variables, states, sims, wave, k,
                  topk="exact"):
    from tak_tpu.mcts.search import MCTS, SearchConfig
    from tak_tpu.mcts.tree import root_visit_counts

    cfg = SearchConfig(num_sims=sims, wave_size=wave, max_children=k,
                       backend="xla", topk_impl=topk)
    mcts = MCTS(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
    tree = mcts.init_batch(states)
    tree = mcts.prepare_root(variables, tree)
    tree = mcts.run_sims(variables, tree)
    visits = jax.vmap(root_visit_counts)(tree)
    v = np.asarray(jax.device_get(visits), np.float64)
    return v / np.maximum(v.sum(-1, keepdims=True), 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--ref-k", type=int, default=96)
    ap.add_argument("--sims", type=int, default=512)
    ap.add_argument("--wave", type=int, default=32)
    ap.add_argument("--games", type=int, default=16)
    ap.add_argument("--plies", type=int, default=24, help="random midgame depth")
    ap.add_argument("--size", type=int, default=6)
    ap.add_argument("--topk", default="exact", help="topk impl for the K run")
    ap.add_argument("--ref-topk", default="exact")
    args = ap.parse_args()

    from tak_tpu.engine.core import get_engine
    from tak_tpu.model.network import Network
    from tak_tpu.types import ONGOING

    engine = get_engine(args.size)
    net = Network(engine)
    variables = net.init_variables(0)

    # random midgame positions: seeded legal playouts, frozen when finished
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

    p_ref = root_policies(engine, net, variables, states,
                          args.sims, args.wave, args.ref_k, args.ref_topk)
    p_k = root_policies(engine, net, variables, states,
                        args.sims, args.wave, args.k, args.topk)
    tv = 0.5 * np.abs(p_ref - p_k).sum(-1)
    top1 = np.mean(p_ref.argmax(-1) == p_k.argmax(-1))
    print(f"K={args.k}/{args.topk} vs K={args.ref_k}/{args.ref_topk} "
          f"@ {args.sims} sims, wave {args.wave}, "
          f"{args.games} positions (ply {args.plies}):")
    print(f"  TV distance: mean {tv.mean():.4f}  max {tv.max():.4f}")
    print(f"  top-1 agreement: {top1:.3f}")


if __name__ == "__main__":
    main()
