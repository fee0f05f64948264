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

Sequential mode (--sprt): rounds of `--games` paired games at fresh
seeds accumulate until an SPRT on decisive games decides between
H0: p = --p0 (A meaningfully weaker) and H1: p = --p1, or --max-games
is reached; every round also reports the Wilson 95% CI on the decisive
win rate, so "no measurable loss" claims carry a CI that excludes the
0.45 bar rather than a single underpowered 32-game reading (reference
gate scale: 128 games, train/src/pit.rs:5).

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


def wilson_ci(wins: int, n: int, z: float = 1.96):
    """95% Wilson score interval on a binomial proportion."""
    if n == 0:
        return 0.0, 1.0
    p = wins / n
    den = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = (z / den) * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
    return max(0.0, center - half), min(1.0, center + half)


def sprt_llr(wins: int, losses: int, p0: float, p1: float) -> float:
    """Log-likelihood ratio of H1 (p=p1) vs H0 (p=p0) on decisive games
    (Bernoulli SPRT; draws carry no information under this model)."""
    import math

    return (wins * math.log(p1 / p0)
            + losses * math.log((1 - p1) / (1 - p0)))


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
    ap.add_argument("--sprt", action="store_true",
                    help="sequential mode: rounds of --games paired "
                    "games until the SPRT decides or --max-games")
    ap.add_argument("--p0", type=float, default=0.45,
                    help="SPRT H0 decisive win rate (A meaningfully "
                    "weaker)")
    ap.add_argument("--p1", type=float, default=0.55,
                    help="SPRT H1 decisive win rate")
    ap.add_argument("--alpha", type=float, default=0.05)
    ap.add_argument("--beta", type=float, default=0.05)
    ap.add_argument("--max-games", type=int, default=256,
                    help="sequential-mode total-games cap")
    ap.add_argument("--subprocess-rounds", action="store_true",
                    help="run each SPRT round in a FRESH child process "
                    "(same argv minus --sprt/--subprocess-rounds, one "
                    "--games round per child, round-indexed --seed).  "
                    "Mitigates the host-memory growth observed in very "
                    "long single-process deep-sim pits (130GB RSS OOM "
                    "after ~70 min; see CLAUDE.md): each child starts "
                    "clean, results accumulate here via --json-out")
    args = ap.parse_args()

    if args.subprocess_rounds:
        import json
        import math
        import subprocess
        import tempfile

        upper = math.log((1 - args.beta) / args.alpha)
        lower = math.log(args.beta / (1 - args.alpha))
        n_rounds = max(1, -(-args.max_games // args.games))
        W = L = D = U = 0
        decision = "inconclusive"
        t0 = time.perf_counter()
        out = args.json_out or tempfile.mktemp(suffix=".jsonl")
        base = [
            sys.executable, os.path.abspath(__file__),
            "--preset", args.preset,
            "--wave-a", str(args.wave_a), "--wave-b", str(args.wave_b),
            "--games", str(args.games), "--sims", str(args.sims),
            "--size", str(args.size), "--budget", str(args.budget),
            "--max-plies", str(args.max_plies), "--json-out", out,
        ]
        if args.sims_b is not None:
            base += ["--sims-b", str(args.sims_b)]
        if args.model:
            base += ["--model", args.model]
        if args.blocks is not None:
            base += ["--blocks", str(args.blocks)]
        for rnd in range(n_rounds):
            cmd = base + ["--seed", str(args.seed + 1000 * rnd)]
            rc = subprocess.run(cmd, env=os.environ).returncode
            if rc != 0:
                print(f"[round {rnd + 1}] child exited {rc}; stopping",
                      flush=True)
                break
            with open(out) as f:
                last = json.loads(f.readlines()[-1])
            W += last["wins"]
            L += last["losses"]
            D += last["draws"]
            U += last["unfinished"]
            n = W + L
            rate = W / n if n else 0.0
            lo, hi = wilson_ci(W, n)
            llr = sprt_llr(W, L, args.p0, args.p1) if n else 0.0
            print(f"[round {rnd + 1}/{n_rounds}] total {W}-{L}-{D}"
                  f"{f'-{U}u' if U else ''}  win_rate={rate:.3f} "
                  f"CI95=[{lo:.3f},{hi:.3f}]  LLR={llr:+.2f} "
                  f"(accept H1 at {upper:+.2f} / H0 at {lower:+.2f})  "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            if llr >= upper:
                decision = "H1"
                break
            if llr <= lower:
                decision = "H0"
                break
        print(f"subprocess-SPRT total: {W}-{L}-{D}"
              f"{f'-{U}u' if U else ''}  decision={decision}")
        return

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

    import math

    cfg = PitConfig(games=args.games, search=a, search_b=b,
                    max_plies=args.max_plies)
    upper = math.log((1 - args.beta) / args.alpha)     # accept H1
    lower = math.log(args.beta / (1 - args.alpha))     # accept H0
    n_rounds = (max(1, -(-args.max_games // args.games))
                if args.sprt else 1)

    W = L = D = U = 0
    decision = "single-round" if not args.sprt else "inconclusive"
    t0 = time.perf_counter()
    for rnd in range(n_rounds):
        res = pit(engine, lambda p, s: net.policy_eval_states(p, s),
                  variables, variables, cfg, seed=args.seed + 1000 * rnd)
        W += res.wins
        L += res.losses
        D += res.draws
        U += res.unfinished
        n = W + L
        rate = W / n if n else 0.0
        lo, hi = wilson_ci(W, n)
        llr = sprt_llr(W, L, args.p0, args.p1) if n else 0.0
        dt = time.perf_counter() - t0
        print(f"[round {rnd + 1}/{n_rounds}] total {W}-{L}-{D}"
              f"{f'-{U}u' if U else ''}  win_rate={rate:.3f} "
              f"CI95=[{lo:.3f},{hi:.3f}]  LLR={llr:+.2f} "
              f"(accept H1 at {upper:+.2f} / H0 at {lower:+.2f})  "
              f"[{dt:.0f}s]", flush=True)
        if args.sprt:
            if llr >= upper:
                decision = "H1"  # A not weaker (p >= p1 favored)
                break
            if llr <= lower:
                decision = "H0"  # A meaningfully weaker
                break
    dt = time.perf_counter() - t0
    n = W + L
    rate = W / n if n else 0.0
    lo, hi = wilson_ci(W, n)
    print(f"preset={args.preset} sims={args.sims} "
          f"games={W + L + D + U} ({dt:.0f}s):")
    print(f"  A (changed) vs B: {W}-{L}-{D}"
          f"{f'-{U}u' if U else ''}  win_rate={rate:.3f} "
          f"CI95=[{lo:.3f},{hi:.3f}]  (n={n} decisive)"
          + (f"  SPRT={decision} (p0={args.p0}, p1={args.p1})"
             if args.sprt else ""))
    if args.json_out:
        import json

        rec_line = {
            "preset": args.preset, "size": args.size, "sims": args.sims,
            "sims_b": sims_b, "games": W + L + D + U, "seed": args.seed,
            "model": args.model, "max_plies": args.max_plies,
            "wins": W, "losses": L, "draws": D,
            "unfinished": U, "win_rate": rate,
            "ci95": [round(lo, 4), round(hi, 4)],
            "seconds": round(dt),
        }
        if args.sprt:
            rec_line["sprt"] = {
                "decision": decision, "llr": round(
                    sprt_llr(W, L, args.p0, args.p1) if n else 0.0, 3),
                "p0": args.p0, "p1": args.p1,
                "alpha": args.alpha, "beta": args.beta,
            }
        if args.preset == "waves":
            rec_line["wave_a"], rec_line["wave_b"] = args.wave_a, args.wave_b
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec_line) + "\n")


if __name__ == "__main__":
    main()
