"""Pure-JAX vectorized Tak rules engine.

TPU-first redesign of the reference rules crate (`tak/src/game.rs`,
`board.rs`, `tile.rs`, `move_gen.rs`): instead of per-move `Vec<Move>`
allocation and recursive DFS road search, everything is fixed-shape array
arithmetic over the flat action space (see `tak_tpu.actions`), so that
`step` / `legal_mask` / `compute_result` jit once per board size and vmap
over thousands of games in lockstep.

All functions here operate on a single (unbatched) `GameState`; batched
variants are created with `jax.vmap` (see `Engine.batched_*`).

Semantics parity notes (validated by tests/):
  * move legality matches `tak/src/move_gen.rs` exactly, including the
    opening swap rule (flat placements only, piece and reserve belong to
    the opponent: game.rs:84-108) and the lone-cap wall smash
    (move_gen.rs:83-88).
  * `compute_result` reproduces `Game::result` (game.rs:220-263): dragon
    clause (just-moved player's road wins), flat-count win with truncated
    half-komi tie-break, reserves-out / board-full endings, and the
    50-reversible-ply draw.  Like the reference (game.rs:211-218), *every*
    spread increments the reversible counter (smash detection is TODO
    upstream too) and every placement resets it.
"""

from __future__ import annotations

from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..actions import Tables
from ..sizes import (
    REVERSIBLE_PLIES,
    default_starting_stones,
    max_stack_height,
    num_patterns,
    stack_words,
    validate,
)
from ..types import (
    BLACK_FLATS,
    BLACK_ROAD,
    CAP,
    DRAW_FLATS,
    DRAW_REVERSIBLE,
    EMPTY,
    FLAT,
    ONGOING,
    WALL,
    WHITE_FLATS,
    WHITE_ROAD,
    GameState,
)

_U32 = jnp.uint32


def _trunc_div2(x):
    """Truncated (toward zero) division by 2, matching Rust's i8 `/`."""
    return jnp.where(x >= 0, x // 2, -((-x) // 2))


# ---------------------------------------------------------------------------
# Bit-packed stack windows.  A "window" is up to 16 bits at a dynamic height,
# spanning at most two of the uint32 words of one square's stack.
# ---------------------------------------------------------------------------

def _read_window(words, lo, size):
    """Extract `size` (<=16) bits starting at bit `lo` from a [W] u32 row."""
    j = jnp.maximum(lo, 0) >> 5
    off = (lo & 31).astype(_U32)
    w0 = jnp.take(words, j, mode="fill", fill_value=0)
    w1 = jnp.take(words, j + 1, mode="fill", fill_value=0)
    # (32 - off) is only used when off >= 1, so clamping to 31 is safe
    hi = jnp.where(off == 0, _U32(0), w1 << jnp.minimum(_U32(32) - off, _U32(31)))
    win = (w0 >> off) | hi
    mask = (_U32(1) << size.astype(_U32)) - _U32(1)
    return win & mask


def _window_words(value, lo, size):
    """Split `value` (size<=16 bits) inserted at bit `lo` into (j, w0, w1).

    Returns the word index j and the two word-aligned contributions, such
    that OR-ing w0 into word j and w1 into word j+1 writes the window
    (assuming those bits are currently zero).
    """
    j = jnp.maximum(lo, 0) >> 5
    off = (lo & 31).astype(_U32)
    v = value.astype(_U32)
    w0 = v << off
    # (32 - off) is only used when off >= 1, so clamping to 31 is safe
    w1 = jnp.where(off == 0, _U32(0), v >> jnp.minimum(_U32(32) - off, _U32(31)))
    return j, w0, w1


class Engine:
    """Rules engine for one board size.  Construct once; methods are pure."""

    def __init__(self, n: int):
        validate(n)
        self.n = n
        self.tables = t = Tables(n)
        self.num_actions = t.num_actions
        self.num_squares = n * n
        self.num_pat = P = num_patterns(n)
        self.words = stack_words(n)
        self.max_height = max_stack_height(n)
        stones, caps = default_starting_stones(n)
        self.start_stones, self.start_caps = stones, caps

        as_j = partial(jnp.asarray)
        self.PAT_DROPS = as_j(t.pat_drops)            # [P, n-1]
        self.PAT_CUM = as_j(
            np.concatenate(
                [np.zeros((P, 1), np.int32), np.cumsum(t.pat_drops, 1)[:, :-1]],
                axis=1,
            )
        )                                             # [P, n-1] carry offsets
        self.PAT_K = as_j(t.pat_k)                    # [P]
        self.PAT_S = as_j(t.pat_s)                    # [P]
        self.PAT_LAST = as_j(t.pat_last)              # [P]
        self.SPREAD_PATH = as_j(t.spread_path)        # [n*n, 4, n-1]
        self.SPREAD_FITS = as_j(t.spread_fits)        # [n*n, 4, P]
        self.CANON_KEY = as_j(t.canon_key)            # [A]
        self.SYM_ACTION = as_j(t.sym_action)          # [8, A]
        self.SYM_SQUARE = as_j(t.sym_square)          # [8, n*n]

    # -- construction -------------------------------------------------------

    def initial(self, half_komi: int = 0) -> GameState:
        """Fresh game (tak/src/game.rs:37-53)."""
        n2, W = self.num_squares, self.words
        return GameState(
            stacks=jnp.zeros((n2, W), _U32),
            heights=jnp.zeros(n2, jnp.int32),
            tops=jnp.zeros(n2, jnp.int32),
            to_move=jnp.int32(0),
            ply=jnp.int32(0),
            stones=jnp.full(2, self.start_stones, jnp.int32),
            caps=jnp.full(2, self.start_caps, jnp.int32),
            half_komi=jnp.int32(half_komi),
            reversible=jnp.int32(0),
            result=jnp.int32(ONGOING),
        )

    # -- basic queries -------------------------------------------------------

    def top_colors(self, state: GameState) -> jnp.ndarray:
        """Color of the top piece per square (garbage where empty)."""
        h1 = state.heights - 1
        j = jnp.maximum(h1, 0) >> 5
        w = jnp.take_along_axis(state.stacks, j[:, None], axis=1)[:, 0]
        return ((w >> (jnp.maximum(h1, 0) & 31).astype(_U32)) & _U32(1)).astype(jnp.int32)

    def flat_diff(self, state: GameState) -> jnp.ndarray:
        """White flat tops minus black flat tops (board.rs:65-75)."""
        owner = self.top_colors(state)
        is_flat = state.tops == FLAT
        return jnp.sum(jnp.where(is_flat, 1 - 2 * owner, 0))

    def _effective_color(self, state: GameState) -> jnp.ndarray:
        """The color whose piece gets placed: swapped in the opening."""
        opening = state.ply < 2
        return jnp.where(opening, 1 - state.to_move, state.to_move)

    # -- road detection ------------------------------------------------------

    def has_road(self, state: GameState, color) -> jnp.ndarray:
        """Edge-to-edge road of flats+caps for `color` (board.rs:77-113).

        Iterated masked dilation over the board instead of recursive DFS:
        label bit0 = reached from the bottom edge (row 0), bit1 = reached
        from the left edge (col 0); n*n dilation steps reach any fixpoint.
        """
        n = self.n
        owner = self.top_colors(state)
        own = (
            (state.heights > 0)
            & (owner == color)
            & ((state.tops == FLAT) | (state.tops == CAP))
        ).reshape(n, n)
        row_seed = jnp.zeros((n, n), jnp.int32).at[0, :].set(1)
        col_seed = jnp.zeros((n, n), jnp.int32).at[:, 0].set(2)
        lab = jnp.where(own, row_seed | col_seed, 0)

        def dilate(_, lab):
            spread = lab
            spread = spread | jnp.roll(lab, 1, 0).at[0, :].set(0)
            spread = spread | jnp.roll(lab, -1, 0).at[-1, :].set(0)
            spread = spread | jnp.roll(lab, 1, 1).at[:, 0].set(0)
            spread = spread | jnp.roll(lab, -1, 1).at[:, -1].set(0)
            return jnp.where(own, spread, 0)

        lab = jax.lax.fori_loop(0, n * n, dilate, lab)
        return jnp.any(lab[-1, :] & 1) | jnp.any(lab[:, -1] & 2)

    # -- game result ---------------------------------------------------------

    def compute_result(self, state: GameState) -> jnp.ndarray:
        """Pure recomputation of the result code (game.rs:220-263)."""
        just_moved = 1 - state.to_move
        road_jm = self.has_road(state, just_moved)
        road_om = self.has_road(state, state.to_move)
        road_code = jnp.where(
            road_jm,
            jnp.where(just_moved == 0, WHITE_ROAD, BLACK_ROAD),
            jnp.where(road_om, jnp.where(state.to_move == 0, WHITE_ROAD, BLACK_ROAD), ONGOING),
        )

        out_of_reserves = jnp.any((state.stones == 0) & (state.caps == 0))
        board_full = jnp.all(state.heights > 0)
        diff = self.flat_diff(state) - _trunc_div2(state.half_komi)
        flat_code = jnp.where(
            diff > 0,
            WHITE_FLATS,
            jnp.where(
                diff < 0,
                BLACK_FLATS,
                jnp.where(state.half_komi % 2 != 0, BLACK_FLATS, DRAW_FLATS),
            ),
        )
        rev_draw = state.reversible >= REVERSIBLE_PLIES

        return jnp.where(
            road_code != ONGOING,
            road_code,
            jnp.where(
                out_of_reserves | board_full,
                flat_code,
                jnp.where(rev_draw, DRAW_REVERSIBLE, ONGOING),
            ),
        ).astype(jnp.int32)

    # -- legal move mask -----------------------------------------------------

    def legal_mask(self, state: GameState) -> jnp.ndarray:
        """Boolean mask over the flat action space (move_gen.rs parity).

        Does NOT account for a finished game; callers gate on
        `state.result == ONGOING` (as `perf_count` does in perft.rs:4-6).
        """
        n, n2, P = self.n, self.num_squares, self.num_pat
        opening = state.ply < 2
        color_eff = self._effective_color(state)
        empty = state.heights == 0

        have_stones = state.stones[color_eff] > 0
        have_caps = state.caps[state.to_move] > 0
        place_flat = empty & have_stones
        place_wall = empty & have_stones & ~opening
        place_cap = empty & have_caps & ~opening

        owner = self.top_colors(state)
        own = (state.heights > 0) & (owner == state.to_move) & ~opening

        tops_pad = jnp.concatenate([state.tops, jnp.array([CAP], jnp.int32)])
        path_tops = tops_pad[self.SPREAD_PATH]           # [n2, 4, n-1]
        passable = path_tops <= FLAT                     # empty or flat
        # prefix_clear[:, :, j] == all squares at distance <= j+1 passable
        prefix_clear = jnp.cumprod(passable.astype(jnp.int32), axis=-1) > 0

        s_idx = self.PAT_S - 1                           # [P]
        # all squares strictly before the final one are passable:
        before_ok = jnp.where(
            self.PAT_S == 1,
            jnp.ones((n2, 4, P), bool),
            prefix_clear[:, :, jnp.maximum(s_idx - 1, 0)],
        )
        final_top = path_tops[:, :, s_idx]               # [n2, 4, P]
        cap_origin = (state.tops == CAP)[:, None, None]
        smash = (final_top == WALL) & cap_origin & (self.PAT_LAST == 1)[None, None, :]
        final_ok = (final_top <= FLAT) | smash

        spread = (
            own[:, None, None]
            & (state.heights[:, None, None] >= self.PAT_K[None, None, :])
            & self.SPREAD_FITS
            & before_ok
            & final_ok
        )                                                # [n2, 4, P]

        return jnp.concatenate(
            [
                place_flat,
                place_wall,
                place_cap,
                jnp.moveaxis(spread, 0, -1).reshape(-1),  # [4, P, n2] flat
            ]
        )

    # -- step ----------------------------------------------------------------

    def step(self, state: GameState, action) -> GameState:
        """Apply one action (assumed legal).  No-op on finished games."""
        n, n2, P, W = self.n, self.num_squares, self.num_pat, self.words
        ch, sq = action // n2, action % n2
        is_place = ch < 3

        # ---- placement branch (game.rs:147-169) ----
        color_eff = self._effective_color(state)
        piece = ch + 1
        p_stacks = state.stacks.at[sq, 0].set(color_eff.astype(_U32))
        p_heights = state.heights.at[sq].set(1)
        p_tops = state.tops.at[sq].set(piece)
        is_cap_place = piece == CAP
        p_stones = state.stones.at[color_eff].add(jnp.where(is_cap_place, 0, -1))
        p_caps = state.caps.at[state.to_move].add(jnp.where(is_cap_place, -1, 0))

        # ---- spread branch (game.rs:171-209) ----
        dp = jnp.maximum(ch - 3, 0)
        d, p = dp // P, dp % P
        k = self.PAT_K[p]
        s = self.PAT_S[p]
        h = state.heights[sq]
        lo = h - k
        carry = _read_window(state.stacks[sq], lo, k)
        # clear the carried bits from the origin
        cj, cm0, cm1 = _window_words((_U32(1) << k.astype(_U32)) - _U32(1), lo, k)
        s_stacks = state.stacks.at[sq, cj].set(state.stacks[sq, cj] & ~cm0)
        s_stacks = s_stacks.at[sq, cj + 1].set(
            jnp.take(s_stacks[sq], cj + 1, mode="fill", fill_value=0) & ~cm1,
            mode="drop",
        )
        s_heights = state.heights.at[sq].set(lo)
        orig_top = state.tops[sq]
        s_tops = state.tops.at[sq].set(jnp.where(lo > 0, FLAT, EMPTY))

        for j in range(n - 1):
            dj = self.PAT_DROPS[p, j]
            active = j < s
            tgt = jnp.where(active, self.SPREAD_PATH[sq, d, j], n2)
            bits = (carry >> self.PAT_CUM[p, j].astype(_U32)) & (
                (_U32(1) << dj.astype(_U32)) - _U32(1)
            )
            th = jnp.where(active, s_heights[tgt], 0)
            wj, w0, w1 = _window_words(bits, th, dj)
            s_stacks = s_stacks.at[tgt, wj].add(w0, mode="drop")
            s_stacks = s_stacks.at[tgt, wj + 1].add(w1, mode="drop")
            s_heights = s_heights.at[tgt].add(jnp.where(active, dj, 0), mode="drop")
            new_top = jnp.where(j == s - 1, orig_top, FLAT)
            s_tops = s_tops.at[tgt].set(new_top, mode="drop")

        # ---- select branch + common updates ----
        new = GameState(
            stacks=jnp.where(is_place, p_stacks, s_stacks),
            heights=jnp.where(is_place, p_heights, s_heights),
            tops=jnp.where(is_place, p_tops, s_tops),
            to_move=1 - state.to_move,
            ply=state.ply + 1,
            stones=jnp.where(is_place, p_stones, state.stones),
            caps=jnp.where(is_place, p_caps, state.caps),
            half_komi=state.half_komi,
            reversible=jnp.where(is_place, 0, state.reversible + 1),
            result=state.result,
        )
        new = new.replace(result=self.compute_result(new))

        # finished games are frozen
        done = state.result != ONGOING
        return jax.tree.map(
            lambda old_leaf, new_leaf: jnp.where(done, old_leaf, new_leaf), state, new
        )

    def wins_in_one(self, state: GameState) -> jnp.ndarray:
        """Mask of legal actions that win immediately for the mover.

        Vectorized equivalent of the reference's instant-win scan
        (train/src/self_play.rs:119-137, playtak/src/bot.rs:60-69): try
        every action, keep the ones whose resulting position is a win for
        the side that just moved.
        """
        from ..types import result_winner

        legal = self.legal_mask(state)
        actions = jnp.arange(self.num_actions, dtype=jnp.int32)

        def try_action(a):
            nxt = self.step(state, a)
            return result_winner(nxt.result) == state.to_move

        return jax.vmap(try_action)(actions) & legal

    # -- batched/jitted wrappers --------------------------------------------

    @cached_property
    def step_1(self):
        return jax.jit(self.step)

    @cached_property
    def legal_mask_1(self):
        return jax.jit(self.legal_mask)

    @cached_property
    def compute_result_1(self):
        return jax.jit(self.compute_result)

    @cached_property
    def batched_step(self):
        return jax.jit(jax.vmap(self.step))

    @cached_property
    def batched_legal_mask(self):
        return jax.jit(jax.vmap(self.legal_mask))

    def initial_batch(self, batch: int, half_komi: int = 0) -> GameState:
        one = self.initial(half_komi)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


_ENGINES: dict[int, Engine] = {}


def get_engine(n: int) -> Engine:
    if n not in _ENGINES:
        _ENGINES[n] = Engine(n)
    return _ENGINES[n]
