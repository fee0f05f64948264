"""COMPILED-mode 7x7/8x8 fused-kernel parity smoke (run on the TPU).

The CPU suite covers the 3- and 4-word (7x7/8x8) kernels only in Pallas
interpreter mode, and this project has already hit real compiled-vs-
interpret divergences (lane alignment, fori_loop unroll — CLAUDE.md), so
the compiled Mosaic lowerings must be exercised on hardware once before
7/8 boards are relied on in production paths (e.g. the playtak bot's
fused win scan).  Oracle: the XLA engine (pinned by perft + native C++
differentials).

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
        python tools/parity_78_compiled.py

Prints one PASS/FAIL line per check and a JSON summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import Engine
from tak_tpu.engine.pallas_env import (
    build_fused_step,
    build_fused_step_legal,
    unpack_legal,
)
from tak_tpu.types import CAP, FLAT, WALL, GameState

B = 128          # lane-width batch (compiled kernels want lane alignment)
PLIES = 8
ROUNDS = 4

FIELDS = ("stacks", "heights", "tops", "to_move", "ply", "stones",
          "caps", "half_komi", "reversible", "result")


def states_equal(a, b):
    bad = []
    for name in FIELDS:
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        if not np.array_equal(av, bv):
            bad.append(name)
    return bad


def tall_stack_states(engine, heights_at_center, seed):
    """Synthetic tall-stack batch (see tests/test_pallas_env78.py)."""
    n, n2, W = engine.n, engine.num_squares, engine.words
    rng = np.random.default_rng(seed)
    Bq = len(heights_at_center)
    center = (n // 2) * n + n // 2
    heights = rng.integers(0, 3, (Bq, n2)).astype(np.int32)
    stacks = np.zeros((Bq, n2, W), np.uint64)
    tops = np.zeros((Bq, n2), np.int32)
    for b in range(Bq):
        heights[b, center] = heights_at_center[b % len(heights_at_center)]
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


def main():
    results = {}
    for n in (7, 8):
        engine = Engine(n)
        t0 = time.perf_counter()

        # 1) playout parity: compiled fused step vs XLA step
        fused = build_fused_step(engine, block_g=B, interpret=False)
        rng = np.random.default_rng(700 + n)
        states = engine.initial_batch(B, 3)
        ok = True
        for ply in range(PLIES):
            masks = np.asarray(jax.vmap(engine.legal_mask)(states))
            acts = np.zeros(B, np.int32)
            for g in range(B):
                legal = np.nonzero(masks[g])[0]
                acts[g] = rng.choice(legal) if len(legal) else 0
            ref = engine.batched_step(states, jnp.asarray(acts))
            got = fused(states, jnp.asarray(acts))
            bad = states_equal(got, ref)
            if bad:
                print(f"FAIL n={n} playout ply={ply}: fields {bad}")
                ok = False
                break
            states = ref
        results[f"{n}_playout"] = ok
        print(f"{'PASS' if ok else 'FAIL'} n={n} compiled playout parity "
              f"({PLIES} plies, B={B}) "
              f"[{time.perf_counter() - t0:.0f}s]")

        # 2) tall stacks crossing word boundaries: step + legal parity
        t0 = time.perf_counter()
        fused_l = build_fused_step_legal(engine, block_g=B, interpret=False)
        hs = ([30, 33, 40, 62, 65, 70, 80, 33] if n == 7
              else [31, 34, 63, 66, 90, 95, 97, 100])
        states = tall_stack_states(engine, hs * (B // len(hs)), seed=n)
        masks = np.asarray(jax.vmap(engine.legal_mask)(states))
        rng = np.random.default_rng(5 + n)
        ok = True
        for round_ in range(ROUNDS):
            acts = np.zeros(B, np.int32)
            for g in range(B):
                legal = np.nonzero(masks[g])[0]
                spreads = legal[legal >= 3 * engine.num_squares]
                pool = (spreads if (len(spreads) and rng.random() < 0.8)
                        else legal)
                acts[g] = rng.choice(pool) if len(pool) else 0
            ref = engine.batched_step(states, jnp.asarray(acts))
            ref_legal = np.asarray(jax.vmap(engine.legal_mask)(ref))
            got, place, spread = fused_l(states, jnp.asarray(acts))
            bad = states_equal(got, ref)
            got_legal = np.asarray(unpack_legal(engine, place, spread))
            if bad or not np.array_equal(got_legal, ref_legal):
                print(f"FAIL n={n} tallstack round={round_}: "
                      f"fields {bad}, legal "
                      f"{np.array_equal(got_legal, ref_legal)}")
                ok = False
                break
            states, masks = ref, ref_legal
        results[f"{n}_tallstack"] = ok
        print(f"{'PASS' if ok else 'FAIL'} n={n} compiled tall-stack "
              f"step+legal parity ({ROUNDS} rounds) "
              f"[{time.perf_counter() - t0:.0f}s]")

        # 3) fused win-in-one scan (the playtak bot path).  The one-shot
        # XLA oracle (vmap(wins_in_one): B x A candidate steps in one
        # program) exhausts HBM at B=128 and crashes the tunneled
        # compile service outright on the 65k-action 8x8 space, so the
        # oracle here is built from engine.batched_step — the SAME small
        # XLA program checks 1-2 already validated — in action chunks:
        # win iff stepping the action gives the mover the win.
        # The fused scan materializes B x A probes in one launch —
        # 128 games x 65k actions is a 25GB program on 8x8, far past
        # HBM.  Its deployment shape is the playtak bot's B=1 per-move
        # scan (playtak/bot.py), so parity runs at a bot-sized batch.
        # The scan flattens to B*A probe rows and blocks THAT axis by
        # block_g (which must stay 128 — Mosaic lane rule); memory
        # scales with B*A rows, so the game batch is what must stay
        # small on the 65k-action 8x8 space (the deployment shape is
        # the playtak bot's B=1 per-move scan, ~105MB there).
        t0 = time.perf_counter()
        G = 2
        BW = 8
        sub = jax.tree.map(lambda x: x[:G], states)
        pad = jax.tree.map(
            lambda x: jnp.concatenate(
                [x] * (BW // G), axis=0), sub)  # BW games -> BW*A rows
        wins_fused = engine.wins_in_one_fused_fn()
        got_w = np.asarray(wins_fused(pad))[:G]

        A = engine.num_actions
        legal = np.asarray(jax.vmap(engine.legal_mask)(sub))
        to_move = np.asarray(sub.to_move)
        ref_w = np.zeros((G, A), bool)
        # small probe batches: the 8x8 step program peaks ~200MB per 128
        # rows; big row counts exhaust the 16G HBM
        CH = 256

        @jax.jit
        def probe(st, acts):
            out = engine.batched_step(st, acts)
            return out.result

        for lo in range(0, A, CH):
            acts = np.arange(lo, min(lo + CH, A), dtype=np.int32)
            n_a = len(acts)
            rep = jax.tree.map(
                lambda x: jnp.repeat(x, n_a, axis=0), sub)
            aa = jnp.asarray(np.tile(acts, G))
            res = np.asarray(probe(rep, aa)).reshape(G, n_a)
            for g in range(G):
                from tak_tpu.types import result_winner

                for j, a in enumerate(acts):
                    if legal[g, a] and int(res[g, j]) != 0:
                        w = int(result_winner(np.int32(res[g, j])))
                        ref_w[g, a] = (w == int(to_move[g]))
        ok = bool(np.array_equal(ref_w, got_w))
        results[f"{n}_wins"] = ok
        print(f"{'PASS' if ok else 'FAIL'} n={n} compiled wins_in_one "
              f"parity [{time.perf_counter() - t0:.0f}s]")

        # 4) PRODUCTION-batch win scan, action-chunked: B=128 on the
        # 65k-action 8x8 space was a 25GB single-launch program (round-4
        # limit); the lax.scan-chunked path keeps live probe rows at
        # B*chunk <= 512k (~0.9GB of probe state).  The B=128 batch
        # tiles the G oracle games, so every tile must repeat ref_w.
        t0 = time.perf_counter()
        BP = 128
        rep128 = jax.tree.map(
            lambda x: jnp.concatenate([x] * (BP // G), axis=0), sub)
        wins_chunked = engine.wins_in_one_fused_fn()  # auto-chunks here
        got128 = np.asarray(wins_chunked(rep128))
        want128 = np.tile(ref_w, (BP // G, 1))
        ok = bool(np.array_equal(got128, want128))
        results[f"{n}_wins_b128_chunked"] = ok
        print(f"{'PASS' if ok else 'FAIL'} n={n} compiled wins_in_one "
              f"B={BP} action-chunked parity "
              f"[{time.perf_counter() - t0:.0f}s]")

    print(json.dumps({"parity_78_compiled": results,
                      "all_pass": all(results.values())}))
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
