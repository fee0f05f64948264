"""Core state pytree for the TPU-native Tak engine.

A `GameState` packs one Tak position into fixed-shape arrays so that
thousands of games step in lockstep under `jit`/`vmap` (the TPU-first
replacement for the reference's pointer-based `Game<N>` in
`tak/src/game.rs:25-35`).

Stacks are bit-packed: bit h of `stacks[sq]` (little-endian across the
uint32 words) holds the color (0=white, 1=black) of the piece at height h
of square sq.  Only the top piece's *type* is stored (`tops`); everything
below a top is necessarily a flat (walls/caps can only ever be topmost),
mirroring the reference's `Tile { piece, stack: Vec<Color> }`
(tak/src/tile.rs:7-10).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Piece codes in `tops`.
EMPTY, FLAT, WALL, CAP = 0, 1, 2, 3
WHITE, BLACK = 0, 1

# Result codes in `result`.
ONGOING = 0
WHITE_ROAD = 1
BLACK_ROAD = 2
WHITE_FLATS = 3
BLACK_FLATS = 4
DRAW_FLATS = 5
DRAW_REVERSIBLE = 6


def result_winner(result) -> jnp.ndarray:
    """-1 = no winner; 0 = white; 1 = black (works on arrays)."""
    is_white = (result == WHITE_ROAD) | (result == WHITE_FLATS)
    is_black = (result == BLACK_ROAD) | (result == BLACK_FLATS)
    return jnp.where(is_white, 0, jnp.where(is_black, 1, -1))


def result_is_road(result) -> jnp.ndarray:
    return (result == WHITE_ROAD) | (result == BLACK_ROAD)


def result_is_draw(result) -> jnp.ndarray:
    return (result == DRAW_FLATS) | (result == DRAW_REVERSIBLE)


@struct.dataclass
class GameState:
    """One Tak position (unbatched; batch via vmap; leading axes broadcast).

    Shapes below are for a single game on an n x n board with W stack words.
    """

    stacks: jnp.ndarray     # uint32 [n*n, W] bit-packed stack colors
    heights: jnp.ndarray    # int32  [n*n]
    tops: jnp.ndarray       # int32  [n*n]  EMPTY/FLAT/WALL/CAP
    to_move: jnp.ndarray    # int32  scalar  0=white 1=black
    ply: jnp.ndarray        # int32  scalar
    stones: jnp.ndarray     # int32  [2]  reserve flats/walls per color
    caps: jnp.ndarray       # int32  [2]  reserve capstones per color
    half_komi: jnp.ndarray  # int32  scalar
    reversible: jnp.ndarray  # int32 scalar  spread plies since last placement
    result: jnp.ndarray     # int32  scalar  result code (cached by step)
