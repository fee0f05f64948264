"""End-to-end self-play throughput at (scaled) reference config.

Measures whole SelfPlayActor moves — search + move selection + example
capture + tree re-rooting — on the chip, reporting sims/s and moves/s.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/profile_selfplay.py

Knobs: SP_WORKERS (default 32, reference self_play.rs:94), SP_SIMS
(default 10000, self_play.rs:12), SP_MOVES (default 6), SP_WAVE, SP_K,
SP_RECYCLE=1 (node-recycled VMEM-tier pool), SP_BUDGET (pool override).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.selfplay import SelfPlayActor, SelfPlayConfig

N = int(os.environ.get("BENCH_SIZE", 6))
WORKERS = int(os.environ.get("SP_WORKERS", 32))
SIMS = int(os.environ.get("SP_SIMS", 10000))
MOVES = int(os.environ.get("SP_MOVES", 6))
WAVE = int(os.environ.get("SP_WAVE", 16))
K = int(os.environ.get("SP_K", 128))
RECYCLE = os.environ.get("SP_RECYCLE", "0") == "1"
BUDGET = int(os.environ.get("SP_BUDGET", 0)) or None
KEEP = int(os.environ.get("SP_KEEP", 0)) or None  # reroot carry cap

engine = get_engine(N)
net = Network(engine)
variables = net.init_variables(0)
cfg = SelfPlayConfig(
    games=10_000_000,  # never finishes; we stop by move count
    workers=WORKERS,
    search=SearchConfig(num_sims=SIMS, wave_size=WAVE, max_children=K,
                        recycle=RECYCLE, node_budget=BUDGET,
                        reroot_keep=KEEP),
)
actor = SelfPlayActor(engine, lambda p, s: net.policy_eval_states(p, s), cfg)
print(f"workers={WORKERS} sims={SIMS} wave={WAVE} k={K} "
      f"backend={actor.mcts._pallas_kind} nodes={actor.search_config.max_nodes}")

moves_done = 0
t_after_warm = None


class StopAfter(Exception):
    pass


orig_run_sims = actor.mcts.run_sims


WARM_MOVES = int(os.environ.get("SP_WARM_MOVES", 2))  # bench.py rationale:
# the move-tail bundle (reroot/keep variants included) compiles lazily
# AFTER the first search, so a timer starting at move 1 catches its
# compile inside the "warmed" window (CLAUDE.md).


def counting_run_sims(params, tree):
    global moves_done, t_after_warm
    out = orig_run_sims(params, tree)
    jax.device_get(out.n0[0])
    moves_done += 1
    if moves_done == WARM_MOVES:
        t_after_warm = time.perf_counter()
        print(f"warmup done ({WARM_MOVES} moves: compile+search)")
    if moves_done >= MOVES + WARM_MOVES:
        raise StopAfter
    return out


actor.mcts.__dict__["run_sims"] = counting_run_sims

t0 = time.perf_counter()
try:
    actor.run(variables, seed=0,
              log=print if os.environ.get("TAK_PROFILE_MOVES")
              else lambda *a, **k: None)
except StopAfter:
    pass
dt = time.perf_counter() - t_after_warm
per_move = dt / MOVES
sims_s = WORKERS * SIMS / per_move
print(f"moves timed: {MOVES}  {per_move * 1e3:,.0f} ms/move  "
      f"{sims_s:,.0f} sims/s  ({WORKERS * 60 / per_move:,.1f} worker-moves/min)")
