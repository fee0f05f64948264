"""Device mesh construction and sharding helpers.

The reference is a single-box system (SURVEY.md §2.7): its only
parallelism is threads + channels on one GPU.  This framework scales the
TPU-native way instead: a `jax.sharding.Mesh` over all addressable
devices, with

  * `dp` — data/game parallelism: self-play game slots and learner batch
    rows are sharded across chips; gradients all-reduce over ICI.
  * `mp` — optional model parallelism over network filters (unused by
    default: the reference nets are 128-filter towers, well under one
    chip's capacity; present so bigger towers can shard).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and
the same code spans hosts (each host feeds its addressable shard of the
game batch).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, mp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    assert n % mp == 0, (n, mp)
    return Mesh(devices.reshape(n // mp, mp), ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over dp for batched pytrees (games, rows)."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree with its leading axis split across dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
