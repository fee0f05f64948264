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
    """Input planes [n, n, input_channels(n)] (float32) for one game."""
    n, n2 = engine.n, engine.num_squares
    to_move = state.to_move
    heights = state.heights
    owner = engine.top_colors(state)
    mine = (owner == to_move).astype(jnp.int32)

    planes = []

    # top-piece planes: channel = 2*(piece-1) + (0 mine / 1 theirs)
    occupied = heights > 0
    for piece in (1, 2, 3):
        is_p = occupied & (state.tops == piece)
        planes.append((is_p & (mine == 1)).astype(jnp.float32))
        planes.append((is_p & (mine == 0)).astype(jnp.float32))

    # sub-top layers: layer i is the piece at height h-2-i
    depth = n + STACK_DEPTH_BEYOND_CARRY - 1
    for i in range(depth):
        h = heights - 2 - i
        present = h >= 0
        j = jnp.maximum(h, 0) >> 5
        w = jnp.take_along_axis(state.stacks, j[:, None], axis=1)[:, 0]
        color = ((w >> (jnp.maximum(h, 0) & 31).astype(_U32)) & _U32(1)).astype(jnp.int32)
        layer_mine = present & (color == to_move)
        planes.append(layer_mine.astype(jnp.float32))
        planes.append((present & ~layer_mine).astype(jnp.float32))

    board = jnp.stack(planes, axis=-1).reshape(n, n, len(planes))

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
