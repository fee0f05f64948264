"""Vectorized perft: breadth-first move-count enumeration on device.

Reproduces the semantics of the reference's recursive `perf_count`
(tak/tests/perft.rs:3-18): a node contributes 1 if depth == 0 or the game
is over; otherwise it contributes the sum over its legal moves.  Instead of
recursion, each depth level is expanded as one batched `legal_mask` +
`step` over every frontier position — the same lockstep pattern the
self-play actor uses, so perft doubles as a stress test of the hot path.
"""

from __future__ import annotations

import jax
import numpy as np

from ..types import ONGOING, GameState
from .core import Engine

_CHUNK = 1 << 16


def _gather(state: GameState, idx: np.ndarray) -> GameState:
    return jax.tree.map(lambda x: x[idx], state)


def _pad_pow2(idx: np.ndarray) -> np.ndarray:
    """Pad an index array to the next power of two (repeat last element).

    Keeps the number of distinct jit shapes logarithmic while expanding
    variable-width tree levels.
    """
    if idx.size == 0:
        return idx
    target = 1 << (int(idx.size - 1)).bit_length()
    return np.concatenate([idx, np.full(target - idx.size, idx[-1], idx.dtype)])


def perft(engine: Engine, state: GameState, depth: int) -> int:
    """Count leaf nodes of the move tree to `depth` from a single state."""
    if depth == 0:
        return 1
    frontier = jax.tree.map(lambda x: x[None], state)  # batch of 1
    total = 0
    for level in range(depth):
        results = np.asarray(frontier.result)
        finished = results != ONGOING
        total += int(finished.sum())
        live = np.nonzero(~finished)[0]
        if live.size == 0:
            return total
        n_live = live.size
        frontier = _gather(frontier, _pad_pow2(live))
        masks = np.asarray(engine.batched_legal_mask(frontier))[:n_live]
        if level == depth - 1:
            return total + int(masks.sum())
        b_idx, a_idx = np.nonzero(masks)
        children = []
        n_children = b_idx.size
        for lo in range(0, b_idx.size, _CHUNK):
            sl = slice(lo, min(lo + _CHUNK, b_idx.size))
            b_pad, a_pad = _pad_pow2(b_idx[sl]), _pad_pow2(a_idx[sl])
            parents = _gather(frontier, b_pad)
            child = engine.batched_step(parents, a_pad)
            children.append(jax.tree.map(np.asarray, child))
        frontier = jax.tree.map(lambda *xs: np.concatenate(xs)[:n_children], *children)
    return total
