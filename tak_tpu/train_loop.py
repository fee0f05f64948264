"""Generational self-play training loop (train/src/main.rs).

Each generation: train a candidate on the replay buffer, gate it against
the incumbent in pit games (accept at win rate > 0.55, main.rs:28,101),
save accepted models as `_models/<unixtime>.model`, truncate the buffer to
the newest 400,000 examples (main.rs:26,111-115), then run self-play with
the incumbent to extend the buffer, streaming examples to
`_examples/<unixtime>.data` (self_play.rs:98).

The reference "copies" the network through a temp-file save/load round
trip (main.rs:125-131); with immutable JAX pytrees the candidate is simply
the value returned by `train`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from .engine.core import Engine
from .examples import ReplayBuffer, example_to_line
from .model.network import Network
from .pit import PitConfig, pit
from .selfplay import SelfPlayActor, SelfPlayConfig

MODEL_DIR = "_models"
EXAMPLE_DIR = "_examples"
GAME_DIR = "_games"


@dataclass
class TrainLoopConfig:
    selfplay: SelfPlayConfig = field(default_factory=SelfPlayConfig)
    pit: PitConfig = field(default_factory=PitConfig)
    max_examples: int = 400_000
    win_rate_threshold: float = 0.55
    generations: int | None = None   # None = loop forever (main.rs:85)
    workdir: str = "."


def sys_time() -> int:
    """Unix seconds, used to name artifacts (alpha-tak/src/lib.rs:33-38)."""
    return int(time.time())


def training_loop(
    engine: Engine,
    network: Network,
    variables,
    buffer: ReplayBuffer,
    config: TrainLoopConfig,
    log=print,
    seed: int = 0,
):
    cfg = config
    for d in (MODEL_DIR, EXAMPLE_DIR, GAME_DIR):
        os.makedirs(os.path.join(cfg.workdir, d), exist_ok=True)

    eval_fn = lambda params, states: network.policy_eval_states(params, states)
    actor = SelfPlayActor(engine, eval_fn, cfg.selfplay)

    generation = 0
    while cfg.generations is None or generation < cfg.generations:
        generation += 1
        if len(buffer) >= 1:
            log(f"[gen {generation}] training on {len(buffer)} examples")
            candidate = network.train(variables, buffer.examples, log=log)

            log(f"[gen {generation}] pitting candidate vs incumbent")
            result = pit(engine, eval_fn, candidate, variables, cfg.pit,
                         seed=seed + generation, log=log)
            log(f"[gen {generation}] {result} win_rate={result.win_rate():.3f}")
            if result.win_rate() > cfg.win_rate_threshold:
                variables = candidate
                path = os.path.join(cfg.workdir, MODEL_DIR, f"{sys_time()}.model")
                network.save(variables, path)
                log(f"[gen {generation}] accepted; saved {path}")
            else:
                log(f"[gen {generation}] rejected")

            buffer.truncate()

        log(f"[gen {generation}] starting self-play")
        path = os.path.join(cfg.workdir, EXAMPLE_DIR, f"{sys_time()}.data")
        with open(path, "w") as f:
            sink = lambda ex: f.write(example_to_line(engine, ex) + "\n")
            new_examples = actor.run(
                variables, seed=seed + 1000 + generation, log=log,
                example_sink=sink,
            )
        buffer.extend(new_examples)
        log(f"[gen {generation}] buffer now {len(buffer)} examples")

    return variables
