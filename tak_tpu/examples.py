"""Training examples, text codec, and the replay buffer.

Example layout mirrors `alpha-tak/src/example.rs`: a game snapshot, the
root visit counts as the (unnormalized) policy target, and the final game
outcome from the side-to-move's perspective.  The line-oriented text codec
is byte-compatible with the reference's `.data` files
(example.rs:81-133):

    TPS;white_stones;white_caps;black_stones;black_caps;half_komi;result;move:visits,...

States are stored compactly (host numpy); NN input planes are recomputed
on device at training time, as the reference does (network.rs:59).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .engine.core import Engine
from .engine.tps import state_to_tps, tps_to_state
from .types import GameState


@dataclass
class Example:
    state: dict                      # numpy-backed GameState fields
    actions: np.ndarray              # int32 [k] visited action ids
    visits: np.ndarray               # int32 [k] visit counts
    result: float = 0.0              # +-1 / 0 from side-to-move perspective

    def policy_dense(self, num_actions: int) -> np.ndarray:
        pi = np.zeros(num_actions, np.float32)
        total = max(int(self.visits.sum()), 1)
        pi[self.actions] = self.visits.astype(np.float32) / total
        return pi


def state_to_host(state: GameState) -> dict:
    import dataclasses

    return {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }


def _host_to_state(d: dict) -> GameState:
    # plain numpy views: jnp.asarray here would round-trip every tiny
    # field through the DEVICE (state_to_tps reads them right back) —
    # ~20 tunnel RTTs per example, measured as ~100ms per example_to_line
    # on the axon backend (an 8-minute buffer save at 5k examples)
    return GameState(**{k: np.asarray(v) for k, v in d.items()})


def stack_states(examples: list[Example]) -> GameState:
    """Stack per-example host states into one batched GameState."""
    import jax.numpy as jnp

    keys = examples[0].state.keys()
    return GameState(
        **{k: jnp.asarray(np.stack([e.state[k] for e in examples])) for k in keys}
    )


def example_to_line(engine: Engine, ex: Example) -> str:
    st = _host_to_state(ex.state)
    tps = state_to_tps(engine, st)
    s = ex.state
    pairs = ",".join(
        f"{engine.tables.action_to_ptn(int(a))}:{int(v)}"
        for a, v in zip(ex.actions, ex.visits)
    )
    result = f"{ex.result:g}" if ex.result != int(ex.result) else str(int(ex.result))
    return (
        f"{tps};{int(s['stones'][0])};{int(s['caps'][0])};"
        f"{int(s['stones'][1])};{int(s['caps'][1])};{int(s['half_komi'])};"
        f"{result};{pairs}"
    )


def line_to_example(engine: Engine, line: str) -> Example:
    parts = line.strip().split(";")
    tps, ws, wc, bs, bc, hk, result, policy = parts
    from .engine.tps import tps_to_host

    host = tps_to_host(engine, tps, half_komi=int(hk))
    host["stones"] = np.array([int(ws), int(bs)], np.int32)
    host["caps"] = np.array([int(wc), int(bc)], np.int32)
    actions, visits = [], []
    for pair in policy.split(","):
        mv, v = pair.rsplit(":", 1)
        actions.append(engine.tables.ptn_to_action(mv))
        visits.append(int(v))
    return Example(
        state=host,
        actions=np.asarray(actions, np.int32),
        visits=np.asarray(visits, np.int32),
        result=float(result),
    )


class ReplayBuffer:
    """Newest-N example window (train/src/main.rs:26,111-115)."""

    def __init__(self, max_examples: int = 400_000):
        self.max_examples = max_examples
        self.examples: list[Example] = []

    def extend(self, new):
        self.examples.extend(new)

    def truncate(self):
        if len(self.examples) > self.max_examples:
            self.examples = self.examples[-self.max_examples:]

    def __len__(self):
        return len(self.examples)

    def save(self, engine: Engine, path: str) -> None:
        with open(path, "w") as f:
            for ex in self.examples:
                f.write(example_to_line(engine, ex) + "\n")

    def load(self, engine: Engine, path: str) -> None:
        with open(path) as f:
            for line in f:
                if line.strip():
                    self.examples.append(line_to_example(engine, line))
