"""Sharded self-play actors: game slots distributed over the mesh.

Self-play is embarrassingly parallel over game slots: the batched engine
step, legal-mask, and MCTS wave pipeline all carry a leading game axis, so
sharding that axis over `dp` scales actors across chips and hosts with no
algorithm change (SURVEY.md §7 step 6).  The network evaluation inside
each wave then runs as a dp-sharded batched forward with replicated
parameters — XLA keeps everything on-chip; only example extraction
crosses to host.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..engine.core import Engine
from ..types import GameState
from .mesh import batch_sharding, shard_batch


class ShardedEnv:
    """dp-sharded batched environment stepping (config 5 of BASELINE.json)."""

    def __init__(self, engine: Engine, mesh: Mesh):
        self.engine = engine
        self.mesh = mesh

    def initial_batch(self, batch: int, half_komi: int = 0) -> GameState:
        states = self.engine.initial_batch(batch, half_komi)
        return shard_batch(self.mesh, states)

    def step(self, states: GameState, actions):
        sh = batch_sharding(self.mesh)
        actions = jax.device_put(actions, sh)
        return self.engine.batched_step(states, actions)

    def legal_mask(self, states: GameState):
        return self.engine.batched_legal_mask(states)
