"""Head-to-head strength A/B between two SEARCH configurations.

The strength guardrail for search changes (node recycling, wave size)
at deep sim budgets, where root-policy TV is meaningless: even wave 16
vs wave 8 on the unbounded HBM tier diverges to TV ~0.86 / top-1 0.00
at 10k sims with an untrained net (tools/quality_control.py), because
PUCT visit concentration is chaotic when leaf values are noise.  What
actually matters is whether the changed search WINS GAMES at the same
budget — measured here with paired-opening pit games, same net both
sides, per-side SearchConfig (pit.py `PitConfig.search_b`).

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
        python tools/strength_ab.py --preset recycle --games 32 --sims 2000

Presets:
    recycle   A = recycled 1280-node VMEM pool   vs B = unbounded HBM tier
    wave      A = wave 32 (recycled)             vs B = wave 16 (recycled)
    wave1     A = wave 16 (recycled)             vs B = wave 1 sequential-
              equivalent (recycled) — the reference's per-game V=1 anchor
              (self_play.rs:181-210); NB ~16x slower for side B
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="recycle",
                    choices=["recycle", "wave", "wave1", "waves"])
    ap.add_argument("--wave-a", type=int, default=32,
                    help="preset=waves: wave size for side A")
    ap.add_argument("--wave-b", type=int, default=16,
                    help="preset=waves: wave size for side B")
    ap.add_argument("--json-out", default=None,
                    help="append one JSON result line to this file")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=2000)
    ap.add_argument("--sims-b", type=int, default=None,
                    help="sim budget for side B (default: --sims); a deep-"
                    "vs-shallow control that SHOULD show a decisive gap")
    ap.add_argument("--size", type=int, default=6)
    ap.add_argument("--budget", type=int, default=1280)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-plies", type=int, default=200)
    ap.add_argument("--model", default=None,
                    help="trained checkpoint (.model) for BOTH sides; "
                    "untrained nets drown in reversible-ply draws")
    ap.add_argument("--blocks", type=int, default=None)
    args = ap.parse_args()

    from tak_tpu.engine.core import get_engine
    from tak_tpu.mcts.search import SearchConfig
    from tak_tpu.model.network import Network
    from tak_tpu.pit import PitConfig, pit

    from tak_tpu.model.resnet import NetConfig

    engine = get_engine(args.size)
    blocks = args.blocks or (16 if args.size >= 6 else 8)
    net = Network(engine, NetConfig(n=args.size, blocks=blocks))
    if args.model:
        variables = net.load(args.model)
    else:
        variables = net.init_variables(0)

    sims_b = args.sims_b or args.sims
    rec = dict(max_children=32, recycle=True,
               node_budget=args.budget, scan_chunk=512)
    if args.preset == "recycle":
        a = SearchConfig(num_sims=args.sims, wave_size=16, **rec)
        b = SearchConfig(num_sims=sims_b, wave_size=16, max_children=128,
                         node_budget=2 * sims_b + 2, backend="pallas_hbm")
    elif args.preset == "wave":
        a = SearchConfig(num_sims=args.sims, wave_size=32, **rec)
        b = SearchConfig(num_sims=sims_b, wave_size=16, **rec)
    elif args.preset == "waves":
        a = SearchConfig(num_sims=args.sims, wave_size=args.wave_a, **rec)
        b = SearchConfig(num_sims=sims_b, wave_size=args.wave_b, **rec)
    else:  # wave1
        a = SearchConfig(num_sims=args.sims, wave_size=16, **rec)
        b = SearchConfig(num_sims=sims_b, wave_size=1, **rec)

    cfg = PitConfig(games=args.games, search=a, search_b=b,
                    max_plies=args.max_plies)
    t0 = time.perf_counter()
    res = pit(engine, lambda p, s: net.policy_eval_states(p, s),
              variables, variables, cfg, seed=args.seed)
    dt = time.perf_counter() - t0
    n = res.wins + res.losses
    print(f"preset={args.preset} sims={args.sims} games={args.games} "
          f"({dt:.0f}s):")
    print(f"  A (changed) vs B: {res}  win_rate={res.win_rate():.3f}"
          f"  (n={n} decisive)")
    if args.json_out:
        import json

        rec_line = {
            "preset": args.preset, "size": args.size, "sims": args.sims,
            "sims_b": sims_b, "games": args.games, "seed": args.seed,
            "model": args.model, "max_plies": args.max_plies,
            "wins": res.wins, "losses": res.losses, "draws": res.draws,
            "unfinished": res.unfinished, "win_rate": res.win_rate(),
            "seconds": round(dt),
        }
        if args.preset == "waves":
            rec_line["wave_a"], rec_line["wave_b"] = args.wave_a, args.wave_b
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec_line) + "\n")


if __name__ == "__main__":
    main()
