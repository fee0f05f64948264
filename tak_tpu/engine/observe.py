"""On-device NN input planes from GameState.

Parity with the reference's tensor encoding (`alpha-tak/src/repr/`): all
planes are from the side-to-move perspective:

  ch 0..5                : top piece (flat/wall/cap) x (mine/theirs)
                           (repr/board.rs:22-33)
  ch 6..6+2*(n+5)        : stack colors below the top, depth-capped at
                           carry + 6 - 1 layers, (mine/theirs) interleaved
                           (repr/board.rs:36-47)
  next 2*stones planes   : one-hot of my/en stone reserve counts
  next 2*caps planes     : one-hot of my/en cap reserve counts
                           (repr/reserves.rs:4-28)
  next 1                 : 1.0 iff white to move (absolute; game.rs:28-33)
  next 1                 : (flat_diff - komi) / n^2  (absolute; game.rs:35-37)

Unlike the reference (sparse index_put on CPU then H2D copy,
net6.rs:124-137), the encoding is built *on device* from the array state,
so self-play never leaves the chip.  Output layout is NHWC ([n, n, C]) —
the TPU-preferred convolution layout — with the channel order above.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sizes import STACK_DEPTH_BEYOND_CARRY
from ..types import FLAT, GameState
from .core import Engine, _trunc_div2, _U32


def observe(engine: Engine, state: GameState) -> jnp.ndarray:
    """Input planes [n, n, input_channels(n)] (float32) for one game.

    Implementation note: this runs once per leaf per MCTS wave, and the
    backend's per-op dispatch cost dominates (see CLAUDE.md), so all
    board planes are built with a handful of broadcasted elementwise ops
    (one [n2, depth] window per stack layer via word *selects*, no
    gathers) instead of a Python loop of per-layer extractions.
    """
    n, n2 = engine.n, engine.num_squares
    to_move = state.to_move
    heights = state.heights
    owner = engine.top_colors(state)
    mine = owner == to_move

    # top-piece planes in one one-hot: channel = 2*(piece-1) + theirs
    occupied = heights > 0
    ch = 2 * (state.tops - 1) + (~mine).astype(jnp.int32)
    ch = jnp.where(occupied, ch, -1)
    top_planes = (ch[:, None] == jnp.arange(6)).astype(jnp.float32)  # [n2, 6]

    # sub-top layers, all depths at once: layer i is the color bit at
    # height h-2-i; the word index only takes values 0..W-1, so select
    # over the W words instead of gathering
    depth = n + STACK_DEPTH_BEYOND_CARRY - 1
    pos = heights[:, None] - 2 - jnp.arange(depth)       # [n2, depth]
    present = pos >= 0
    p = jnp.maximum(pos, 0)
    j = p >> 5
    word = jnp.broadcast_to(state.stacks[:, 0:1], p.shape)
    for k in range(1, engine.words):
        word = jnp.where(j >= k, state.stacks[:, k : k + 1], word)
    color = ((word >> (p & 31).astype(_U32)) & _U32(1)).astype(jnp.int32)
    layer_mine = present & (color == to_move)
    sub = jnp.stack(
        [layer_mine, present & ~layer_mine], axis=-1
    ).reshape(n2, 2 * depth).astype(jnp.float32)

    board = jnp.concatenate([top_planes, sub], axis=-1).reshape(
        n, n, 6 + 2 * depth
    )

    # reserve one-hots (constant planes)
    def onehot(count, size):
        return (jnp.arange(size) == count - 1).astype(jnp.float32) * (count > 0)

    my, en = to_move, 1 - to_move
    reserve_vec = jnp.concatenate([
        onehot(state.stones[my], engine.start_stones),
        onehot(state.stones[en], engine.start_stones),
        onehot(state.caps[my], engine.start_caps),
        onehot(state.caps[en], engine.start_caps),
    ])
    reserves = jnp.broadcast_to(reserve_vec, (n, n, reserve_vec.shape[0]))

    colour = jnp.full((n, n, 1), (to_move == 0).astype(jnp.float32))
    fcd = engine.flat_diff(state) - _trunc_div2(state.half_komi)
    fcd_plane = jnp.full((n, n, 1), fcd.astype(jnp.float32) / n2)

    return jnp.concatenate([board, reserves, colour, fcd_plane], axis=-1)
