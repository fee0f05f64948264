"""Precompile a config's full jit shape family into the persistent cache.

First compiles on the TPU backend go through a tunneled compile service
(20-240s each; see CLAUDE.md), so a cold first generation pays minutes of
compile latency spread across the run.  This module touches every jitted
function a self-play + train + pit generation uses — with the exact
shapes the real run will use — so a one-off `python -m tak_tpu.cli.warmup`
populates the persistent compilation cache and later runs start hot.

Each entry is compiled with real-shaped dummy inputs and forced through a
host readback (`jax.block_until_ready` does not wait on the axon backend).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.core import Engine
from ..model.network import Network
from ..selfplay import SelfPlayActor, SelfPlayConfig


def _force(x):
    """Force execution via a host readback of one scalar leaf."""
    leaves = jax.tree.leaves(x)
    if leaves:
        jax.device_get(jnp.ravel(leaves[0])[0])


def _timed(log, name, fn):
    t0 = time.perf_counter()
    out = fn()
    _force(out)
    log(f"[warmup] {name}: {time.perf_counter() - t0:.1f}s")
    return out


def warmup_selfplay(engine: Engine, network: Network, cfg: SelfPlayConfig,
                    variables=None, log=print):
    """Compile the whole self-play generation shape family (one actor)."""
    variables = variables or network.init_variables(0)
    eval_fn = lambda p, s: network.policy_eval_states(p, s)
    actor = SelfPlayActor(engine, eval_fn, cfg)
    B = cfg.workers
    key = jax.random.PRNGKey(0)
    mask = jnp.ones(B, bool)
    zeros = jnp.zeros(B, jnp.int32)

    states = engine.initial_batch(B, 2 * cfg.komi)
    states = _timed(log, "masked_step",
                    lambda: actor._masked_step(states, zeros, mask))
    corner = jnp.full(B, engine.num_squares - 1, jnp.int32)
    states = actor._masked_step(states, corner, mask)
    _timed(log, "wins_in_one", lambda: actor._batched_wins(states))
    _timed(log, "legal_mask", lambda: actor._batched_legal(states))

    tree = _timed(log, "init_batch", lambda: actor.mcts.init_batch(states))
    tree = _timed(log, "prepare_root",
                  lambda: actor.mcts.prepare_root(variables, tree))
    tree = _timed(log, "add_noise", lambda: actor.mcts.add_noise(
        key, tree, cfg.noise_alpha, cfg.noise_ratio, mask))
    tree = _timed(log, "run_sims (the big one)",
                  lambda: actor.mcts.run_sims(variables, tree))
    acts = _timed(log, "select_moves",
                  lambda: actor.mcts.select_moves(key, tree, mask))
    # the fused move tail (visit compaction + snapshot + step + reroot +
    # any-win): the one program the per-move readback waits on
    bundle = _timed(log, "move_bundle",
                    lambda: actor._move_bundle(tree, states, acts, mask))
    tree, stepped = bundle[0], bundle[1]
    if cfg.tree_reuse:
        _timed(log, "tree_reset",
               lambda: actor._masked_tree_reset(tree, stepped, mask))
    _timed(log, "env_reset", lambda: actor._masked_reset(stepped, mask))
    return actor


def warmup_train(engine: Engine, network: Network, variables=None,
                 chunk_size: int = 500, log=print):
    """Compile the training chunk + optimizer-step shapes."""
    variables = variables or network.init_variables(0)
    params, batch_stats = variables["params"], variables["batch_stats"]
    from ..sizes import input_channels

    n = engine.n
    A = network.config.policy_size
    planes = jnp.zeros((chunk_size, n, n, input_channels(n)), jnp.float32)
    pi = jnp.full((chunk_size, A), 1.0 / A, jnp.float32)
    z = jnp.zeros(chunk_size, jnp.float32)
    grad_acc = jax.tree.map(jnp.zeros_like, params)
    opt_state = network.optimizer.init(params)
    grad_acc, batch_stats, _, _ = _timed(
        log, f"train chunk ({chunk_size})",
        lambda: network._accum_chunk(params, batch_stats, grad_acc,
                                     planes, pi, z),
    )
    _timed(log, "optimizer step",
           lambda: network._apply_update(params, opt_state, grad_acc))


def warmup_pit(engine: Engine, network: Network, pit_cfg, variables=None,
               log=print):
    """Compile the gating half-batch search shapes (pit.py search_half)."""
    from ..mcts.search import MCTS

    variables = variables or network.init_variables(0)
    eval_fn = lambda p, s: network.policy_eval_states(p, s)
    mcts = MCTS(engine, eval_fn, pit_cfg.search)
    H = pit_cfg.games // 2
    key = jax.random.PRNGKey(0)
    states = engine.initial_batch(H, 2 * pit_cfg.komi)
    states = engine.batched_step(states, jnp.zeros(H, jnp.int32))
    states = engine.batched_step(
        states, jnp.full(H, engine.num_squares - 1, jnp.int32))
    tree = _timed(log, f"pit init (H={H})", lambda: mcts.init_batch(states))
    tree = _timed(log, "pit prepare_root",
                  lambda: mcts.prepare_root(variables, tree))
    tree = _timed(log, "pit run_sims",
                  lambda: mcts.run_sims(variables, tree))
    _timed(log, "pit select_moves",
           lambda: mcts.select_moves(key, tree, jnp.ones(H, bool)))
    # the env step shape pit uses (full batch of 2H)
    full = engine.initial_batch(2 * H, 2 * pit_cfg.komi)
    _timed(log, "pit step",
           lambda: engine.batched_step(full, jnp.zeros(2 * H, jnp.int32)))


def warmup_generation(engine: Engine, network: Network,
                      selfplay_cfg: SelfPlayConfig, pit_cfg=None,
                      chunk_size: int = 500, log=print):
    """One call that warms a full training generation's shape family."""
    t0 = time.perf_counter()
    variables = network.init_variables(0)
    warmup_selfplay(engine, network, selfplay_cfg, variables, log=log)
    warmup_train(engine, network, variables, chunk_size, log=log)
    if pit_cfg is not None:
        warmup_pit(engine, network, pit_cfg, variables, log=log)
    log(f"[warmup] total {time.perf_counter() - t0:.1f}s")
