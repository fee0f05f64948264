"""Headline benchmark: 6x6 MCTS sims/s and env-steps/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baselines (BASELINE.md driver targets, per chip on 6x6):
  * >= 100,000 MCTS sims/s  (primary metric; vs_baseline = value / 1e5)
  * >= 1,000,000 env-steps/s (reported in extras)
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache + TPU-native PRNG (threefry burns VPU cycles)
os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

N = int(os.environ.get("BENCH_SIZE", 6))
ENV_BATCH = int(os.environ.get("BENCH_ENV_BATCH", 8192))
ENV_STEPS = int(os.environ.get("BENCH_ENV_STEPS", 64))
MCTS_BATCH = int(os.environ.get("BENCH_MCTS_BATCH", 512))
MCTS_SIMS = int(os.environ.get("BENCH_MCTS_SIMS", 512))
# K=32 is quality-neutral at this sims budget (root policy identical to
# K=96, TV distance 0; binds only near K~8).  Wave=32 sits inside the
# production range (self-play waves 8-16, Player 64); larger waves score
# higher (V=64 -> 141.7k, V=128 -> 145.4k sims/s) but add virtual-loss
# staleness — the measured wave/quality tradeoff curve is in
# docs/ROADMAP.md.
MCTS_WAVE = int(os.environ.get("BENCH_MCTS_WAVE", 32))
MCTS_K = int(os.environ.get("BENCH_MCTS_K", 32))
# reference self-play config (train/src/self_play.rs:10-19,94): 32
# lockstep games x 10,000 rollouts/move — the production number, reported
# as an extra so the headline can't drift from what training actually
# sees.  BENCH_SP=0 skips it.
SP_ENABLE = os.environ.get("BENCH_SP", "1") == "1"
SP_WORKERS = int(os.environ.get("BENCH_SP_WORKERS", 32))
SP_SIMS = int(os.environ.get("BENCH_SP_SIMS", 10_240))
SP_MOVES = int(os.environ.get("BENCH_SP_MOVES", 4))
# wave 256 is the measured throughput peak of the sustained e2e curve
# (40.0k/42.3k/44.9k/56.0k/75.0k/5.5k at waves 16..512, docs/ROADMAP.md)
# and is now strength-cleared AT THE TRUE OPERATING POINT: the round-5
# 6x6 A/B at 10,240 sims (trained checkpoint, 32 paired-opening games,
# runs/strength_ab_r5.jsonl) scored 14-7-11 for wave 256 vs wave 16 —
# win_rate 0.667, CI95 [0.454, 0.828], SPRT LLR +1.40 toward "not
# weaker".  This reverses the 2048-sim leaning-negative read (0.409),
# as the staleness-fraction argument predicted (12.5% of the budget in
# flight there vs 2.5% here).
SP_WAVE = int(os.environ.get("BENCH_SP_WAVE", 256))


def bench_env(engine):
    """Random-legal-move lockstep playouts, all on device.

    On TPU the whole loop body (legal mask, uniform-over-legal sample,
    step, result, reset) runs in ONE fused Pallas kernel with the step
    loop in-kernel (engine/pallas_env.py); the XLA loop below remains as
    the CPU / large-board fallback and as the parity reference.
    """
    from tak_tpu.types import ONGOING

    if jax.default_backend() != "cpu" and engine.fused_kernels_supported:
        rollout = jax.jit(engine.env_rollout_fn(ENV_STEPS))
        states = engine.initial_batch(ENV_BATCH, 4)
        states = rollout(states, jnp.int32(0))
        jax.device_get(states.ply[0])  # force compile + warmup
        reps = 8
        t0 = time.perf_counter()
        for i in range(reps):
            states = rollout(states, jnp.int32(i + 1))
        jax.device_get(states.ply[0])
        dt = time.perf_counter() - t0
        return ENV_BATCH * ENV_STEPS * reps / dt

    fresh = engine.initial(4)

    @jax.jit
    def rollout(states, rng):
        def body(carry, _):
            states, rng = carry
            rng, k = jax.random.split(rng)
            masks = jax.vmap(engine.legal_mask)(states)
            # uniform-random legal move = argmax of random keys over the mask
            bits = jax.random.bits(k, masks.shape, jnp.uint16)
            actions = jnp.argmax(
                jnp.where(masks, bits, jnp.uint16(0)), -1
            ).astype(jnp.int32)
            states = engine.batched_step(states, actions)
            done = states.result != ONGOING
            states = jax.tree.map(
                lambda cur, init: jnp.where(
                    done.reshape((-1,) + (1,) * (cur.ndim - 1)),
                    jnp.broadcast_to(init, cur.shape),
                    cur,
                ),
                states,
                fresh,
            )
            return (states, rng), None

        (states, _), _ = jax.lax.scan(body, (states, rng), None, length=ENV_STEPS)
        return states

    states = engine.initial_batch(ENV_BATCH, 4)
    rng = jax.random.PRNGKey(0)
    # NB: block_until_ready does NOT wait on the axon backend (execution
    # defers until a host readback); device_get a scalar to force it.
    jax.device_get(rollout(states, rng).ply[0])  # compile
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        states = rollout(states, jax.random.PRNGKey(i + 1))
    jax.device_get(states.ply[0])
    dt = time.perf_counter() - t0
    return ENV_BATCH * ENV_STEPS * reps / dt


def bench_mcts(engine):
    from tak_tpu.mcts.search import MCTS, SearchConfig
    from tak_tpu.model.network import Network

    network = Network(engine)  # flagship Net6: 16 blocks x 128 filters
    variables = network.init_variables(0)
    eval_fn = lambda p, s: network.policy_eval_states(p, s)
    cfg = SearchConfig(num_sims=MCTS_SIMS, wave_size=MCTS_WAVE,
                       max_children=MCTS_K)
    mcts = MCTS(engine, eval_fn, cfg)

    states = engine.initial_batch(MCTS_BATCH, 4)
    states = engine.batched_step(states, jnp.zeros(MCTS_BATCH, jnp.int32))
    states = engine.batched_step(
        states, jnp.full(MCTS_BATCH, engine.num_squares - 1, jnp.int32)
    )

    def run(tree):
        tree = mcts.prepare_root(variables, tree)
        tree = mcts.run_sims(variables, tree)
        return tree

    # Tree allocation happens OUTSIDE the timed region: in self-play the
    # tree pool persists across moves (re-rooted in place), so sustained
    # throughput is prepare_root + run_sims.  Each rep gets its own fresh
    # tree (rerunning on a searched tree would measure pool-full
    # fallbacks instead of searches).
    reps = 3
    trees = [mcts.init_batch(states) for _ in range(reps + 1)]
    jax.device_get(run(trees[-1]).n0[0])  # compile (forced readback)
    for t in trees[:reps]:
        jax.device_get(t.n0[0])  # materialize before the timer
    t0 = time.perf_counter()
    for i in range(reps):
        tree = run(trees[i])
        jax.device_get(tree.n0[0])
    dt = time.perf_counter() - t0
    sims = MCTS_BATCH * cfg.num_waves * cfg.wave_size * reps
    return sims / dt


def bench_selfplay(engine):
    """End-to-end self-play at the reference config (10k rollouts, 32
    lockstep games): whole SelfPlayActor moves — search + selection +
    example capture + tree re-rooting — on the recycled VMEM-tier pool."""
    from tak_tpu.mcts.search import SearchConfig
    from tak_tpu.model.network import Network
    from tak_tpu.selfplay import SelfPlayActor, SelfPlayConfig

    net = Network(engine)
    variables = net.init_variables(0)
    cfg = SelfPlayConfig(
        games=10_000_000,  # stopped by move count below
        workers=SP_WORKERS,
        search=SearchConfig(num_sims=SP_SIMS, wave_size=SP_WAVE,
                            max_children=32, recycle=True),
    )
    actor = SelfPlayActor(engine, lambda p, s: net.policy_eval_states(p, s),
                          cfg)

    state = {"moves": 0, "t_warm": None, "t_end": None}

    class StopAfter(Exception):
        pass

    orig = actor.mcts.run_sims

    def counting(params, tree):
        out = orig(params, tree)
        jax.device_get(out.n0[0])
        state["moves"] += 1
        # timing starts after move 2: move 1 compiles the search
        # programs, and the move-1 BUNDLE (step+reroot+readback tail)
        # compiles between move 1's and move 2's searches — starting at
        # move 1 would put that compile inside the timed window on a
        # cold cache
        if state["moves"] == 2:
            state["t_warm"] = time.perf_counter()
        if state["moves"] >= SP_MOVES + 2:
            state["t_end"] = time.perf_counter()
            raise StopAfter
        return out

    actor.mcts.__dict__["run_sims"] = counting
    try:
        actor.run(variables, seed=0, log=lambda *a, **k: None)
    except StopAfter:
        pass
    dt = state["t_end"] - state["t_warm"]
    return SP_WORKERS * SP_SIMS * SP_MOVES / dt


def main():
    import sys

    from tak_tpu.engine.core import get_engine

    def note(msg):  # progress on stderr; stdout stays the one JSON line
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    engine = get_engine(N)
    t0 = time.perf_counter()
    note("env phase starting")
    env_rate = bench_env(engine)
    note(f"env done at {time.perf_counter() - t0:.0f}s; mcts starting")
    mcts_rate = bench_mcts(engine)
    note(f"mcts done at {time.perf_counter() - t0:.0f}s; selfplay starting")
    sp_rate = None
    if SP_ENABLE:
        try:
            sp_rate = bench_selfplay(engine)
        except Exception as e:
            note(f"selfplay extra failed: {type(e).__name__}: {e}")
            sp_rate = None
    note(f"all phases done at {time.perf_counter() - t0:.0f}s")
    extras = {}
    if sp_rate is not None:
        extras["selfplay_sims_per_s"] = round(sp_rate)
        extras["selfplay_config"] = {
            "workers": SP_WORKERS, "rollouts": SP_SIMS, "recycle": True,
            "wave": SP_WAVE,
        }
    print(json.dumps({
        "metric": f"mcts_sims_per_s_{N}x{N}",
        "value": round(mcts_rate),
        "unit": "sims/s",
        "vs_baseline": round(mcts_rate / 100_000, 3),
        "env_steps_per_s": round(env_rate),
        "env_vs_baseline": round(env_rate / 1_000_000, 3),
        "device": str(jax.devices()[0]),
        "config": {"env_batch": ENV_BATCH, "mcts_batch": MCTS_BATCH,
                   "mcts_sims": MCTS_SIMS, "wave": MCTS_WAVE, "k": MCTS_K},
        **extras,
    }))


if __name__ == "__main__":
    main()
