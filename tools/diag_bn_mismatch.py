"""Discriminate WHY gate candidates degrade (round-5 plateau forensics).

Reproduces the trainer's candidate exactly (same checkpoint, same
deterministic per-(seed, generation) shuffle), then pits three variants
against the champion at the gate's search budget:

  A: candidate as trained              (expect ~0.13 per the gen-17 gate)
  B: candidate params + CHAMPION batch_stats
  C: champion params + CANDIDATE batch_stats

If B recovers to ~0.5 while A is bad -> the BatchNorm running-stats
update during training is poisoning inference (train/inference
mismatch).  If C is bad while B is bad too -> the stats are fine and
the PARAMS themselves degrade (the weak-improvement-operator reading).

Usage:
    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
        python tools/diag_bn_mismatch.py [--workdir runs/train6_r4]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/train6_r4")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--seed", type=int, default=6, help="trainer seed")
    ap.add_argument("--pit-seed", type=int, default=99)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from tak_tpu.engine.core import get_engine
    from tak_tpu.mcts.search import SearchConfig
    from tak_tpu.model.network import Network
    from tak_tpu.pit import PitConfig, pit
    from tak_tpu.train_loop import load_training_run

    engine = get_engine(6)
    net = Network(engine)
    champion, buffer, gen = load_training_run(engine, net, args.workdir)
    print(f"checkpoint: generation {gen}, buffer {len(buffer)} examples",
          flush=True)
    candidate = net.train(
        champion, buffer.examples,
        rng=np.random.default_rng([args.seed, gen + 1]),
        passes=args.passes,
    )

    variants = {
        "A candidate(as-trained)": candidate,
        "B cand-params+champ-stats": {
            "params": candidate["params"],
            "batch_stats": champion["batch_stats"],
        },
        "C champ-params+cand-stats": {
            "params": champion["params"],
            "batch_stats": candidate["batch_stats"],
        },
    }
    cfg = PitConfig(
        games=args.games, komi=2,
        search=SearchConfig(num_sims=args.sims, wave_size=16,
                            max_children=128),
        max_plies=200,
    )
    eval_fn = lambda p, s: net.policy_eval_states(p, s)
    for name, v in variants.items():
        res = pit(engine, eval_fn, v, champion, cfg, seed=args.pit_seed,
                  log=lambda *a, **k: None)
        print(f"{name}: {res}  win_rate={res.win_rate():.3f}", flush=True)


if __name__ == "__main__":
    main()
