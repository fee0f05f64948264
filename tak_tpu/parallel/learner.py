"""Data-parallel learner: one jitted train step over the device mesh.

The learner shards the (symmetry-expanded) example batch over `dp` and
keeps parameters replicated; XLA inserts the gradient all-reduce over ICI
from the sharding annotations (no hand-written collectives).  This is the
pod-scale replacement for the reference's single-GPU
backward-every-20-chunks loop (network.rs:90-96) — the effective batch
stays 10,000 examples x 8 symmetries; it is simply laid out across chips.
"""

from __future__ import annotations

from functools import cached_property

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..model.network import Network
from .mesh import batch_sharding, replicated


class DPLearner:
    def __init__(self, network: Network, mesh: Mesh):
        self.network = network
        self.mesh = mesh

    @cached_property
    def train_step(self):
        net = self.network
        rep = replicated(self.mesh)
        shard = batch_sharding(self.mesh)

        @jax.jit
        def step(params, batch_stats, opt_state, planes, pi, z):
            planes = jax.lax.with_sharding_constraint(planes, shard)
            pi = jax.lax.with_sharding_constraint(pi, shard)
            z = jax.lax.with_sharding_constraint(z, shard)
            (loss, (new_bs, lp, lz)), grads = jax.value_and_grad(
                net._loss, has_aux=True
            )(params, batch_stats, planes, pi, z)
            updates, opt_state = net.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = jax.lax.with_sharding_constraint(params, rep)
            return params, new_bs, opt_state, lp, lz

        return step

    def init_opt_state(self, params):
        return self.network.optimizer.init(params)

    def place(self, planes, pi, z):
        shard = batch_sharding(self.mesh)
        return (
            jax.device_put(planes, shard),
            jax.device_put(pi, shard),
            jax.device_put(z, shard),
        )
