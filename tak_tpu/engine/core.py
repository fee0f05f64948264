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
        # distance of square q from origin o along direction d (0 = not on
        # the ray); lets step() update all drop targets with vectorized
        # per-square selects instead of serialized dynamic scatters
        dist = np.zeros((n * n, 4, n * n), np.int32)
        for o in range(n * n):
            for d in range(4):
                for j in range(n - 1):
                    q = t.spread_path[o, d, j]
                    if q < n * n:
                        dist[o, d, q] = j + 1
        self.PATH_DIST = jnp.asarray(dist)            # [n2, 4, n2]

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
        # constant one-hot operators that turn the legal-mask gathers into
        # MXU matmuls (TPU gathers are scalar-unit-bound; constant-index
        # gathers of batched operands are the hot path's worst op)
        pad = n * n + 1
        path_flat = t.spread_path.reshape(-1)          # [n2*4*(n-1)]
        path_onehot = np.zeros((pad, path_flat.size), np.float32)
        path_onehot[path_flat, np.arange(path_flat.size)] = 1.0
        self.PATH_ONEHOT = jnp.asarray(path_onehot)    # [n2+1, n2*4*(n-1)]
        sel_s = np.zeros((t.pat_s.size, n - 1), np.float32)
        sel_s[np.arange(t.pat_s.size), t.pat_s - 1] = 1.0
        self.SEL_S = jnp.asarray(sel_s)                # [P, n-1]
        sel_k = np.zeros((n, t.pat_k.size), np.float32)
        sel_k[t.pat_k - 1, np.arange(t.pat_k.size)] = 1.0
        self.SEL_K = jnp.asarray(sel_k)                # [n, P]
        self.LAST1 = jnp.asarray((t.pat_last == 1).astype(np.float32))  # [P]
        self.FITS_F = jnp.asarray(t.spread_fits.astype(np.float32))

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

    def roads(self, state: GameState) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(white_road, black_road): edge-to-edge roads of flats+caps
        (board.rs:77-113).

        Bitboard flood fill: the whole board packs into one or two u32
        words per game (bit q = square q), so every dilation op is a
        *scalar* shift/and/or — vmapped over the batch these become
        [B]-shaped full-lane-occupancy VPU ops, ~10x cheaper than any
        per-square grid layout (see CLAUDE.md tiling note).  Four floods
        run in lockstep (white/black x from-bottom/from-left); the n*n
        fixpoint steps run in a `lax.scan` (unroll=6) so compile cost
        stays constant in board size.
        """
        n, n2 = self.n, self.num_squares
        owner = self.top_colors(state)
        roady = (state.heights > 0) & ((state.tops == FLAT) | (state.tops == CAP))

        q = np.arange(n2)
        full = (1 << n2) - 1
        col0 = sum(1 << qq for qq in range(0, n2, n))
        colL = col0 << (n - 1)
        bottom = (1 << n) - 1
        top = bottom << (n2 - n)
        nc0 = full & ~col0            # allowed destinations of a <<1
        ncl = full & ~colL            # allowed destinations of a >>1
        two = n2 > 32

        w_lo = jnp.asarray(
            np.where(q < 32, np.uint32(1) << (q % 32).astype(np.uint32), 0),
            _U32,
        )

        def lo32(x):
            return _U32(x & 0xFFFFFFFF)

        def hi32(x):
            return _U32(x >> 32)

        def pack(mask):
            lo = jnp.sum(jnp.where(mask, w_lo, _U32(0)), dtype=_U32)
            if not two:
                return (lo,)
            w_hi = jnp.asarray(
                np.where(q >= 32, np.uint32(1) << (q % 32).astype(np.uint32), 0),
                _U32,
            )
            hi = jnp.sum(jnp.where(mask, w_hi, _U32(0)), dtype=_U32)
            return (lo, hi)

        own = [pack(roady & (owner == c)) for c in (0, 1)]

        if not two:
            def dilate(lab, ow):
                (lo,) = lab
                d = (
                    lo
                    | ((lo << 1) & lo32(nc0))
                    | ((lo >> 1) & lo32(ncl))
                    | (lo << n)
                    | (lo >> n)
                )
                return (d & ow[0],)

            def seed(ow, mask):
                return (ow[0] & lo32(mask),)

            def hits(lab, mask):
                return (lab[0] & lo32(mask)) != 0
        else:
            def dilate(lab, ow):
                lo, hi = lab
                a_lo = (lo << 1) & lo32(nc0)
                a_hi = ((hi << 1) | (lo >> 31)) & hi32(nc0)
                b_lo = ((lo >> 1) | (hi << 31)) & lo32(ncl)
                b_hi = (hi >> 1) & hi32(ncl)
                c_lo = lo << n
                c_hi = (hi << n) | (lo >> (32 - n))
                d_lo = (lo >> n) | (hi << (32 - n))
                d_hi = hi >> n
                nlo = (lo | a_lo | b_lo | c_lo | d_lo) & ow[0]
                nhi = (hi | a_hi | b_hi | c_hi | d_hi) & ow[1]
                return (nlo, nhi)

            def seed(ow, mask):
                return (ow[0] & lo32(mask), ow[1] & hi32(mask))

            def hits(lab, mask):
                return ((lab[0] & lo32(mask)) | (lab[1] & hi32(mask))) != 0

        # planes: (white, black) x (from-bottom, from-left)
        labs = (
            seed(own[0], bottom), seed(own[0], col0),
            seed(own[1], bottom), seed(own[1], col0),
        )
        owns = (own[0], own[0], own[1], own[1])

        # fully unrolled: one fused elementwise chain (a scan/fori lowers
        # to serialized kernel launches at ~1ms each on this backend)
        for _ in range(n2):
            labs = tuple(dilate(l, o) for l, o in zip(labs, owns))

        white = hits(labs[0], top) | hits(labs[1], colL)
        black = hits(labs[2], top) | hits(labs[3], colL)
        return white, black

    def has_road(self, state: GameState, color) -> jnp.ndarray:
        white, black = self.roads(state)
        return jnp.where(color == 0, white, black)

    # -- game result ---------------------------------------------------------

    def compute_result(self, state: GameState) -> jnp.ndarray:
        """Pure recomputation of the result code (game.rs:220-263)."""
        just_moved = 1 - state.to_move
        white_road, black_road = self.roads(state)
        road_jm = jnp.where(just_moved == 0, white_road, black_road)
        road_om = jnp.where(just_moved == 0, black_road, white_road)
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

        # --- spreads ----------------------------------------------------
        # Pattern legality factors only through (total k, #squares s, last
        # drop == 1), so combine everything at [n2, 4, n-1] first and
        # expand to the pattern axis with one take at the end.
        tops_pad = jnp.concatenate([state.tops, jnp.array([CAP], jnp.int32)])
        # NB: flat 1-D take, not tops_pad[SPREAD_PATH] — XLA:TPU compiles
        # multi-dim-indexed gathers of 1-D operands pathologically (200s+)
        path_tops = jnp.take(tops_pad, self.SPREAD_PATH.reshape(-1)).reshape(
            n2, 4, n - 1
        )                                                # [n2, 4, n-1]
        passable = path_tops <= FLAT                     # empty or flat
        # prefix_clear[:, :, j] == all squares at distance <= j+1 passable
        prefix_clear = jnp.cumprod(passable.astype(jnp.int8), axis=-1) > 0
        before = jnp.concatenate(  # squares strictly before distance j clear
            [jnp.ones((n2, 4, 1), bool), prefix_clear[:, :, :-1]], axis=-1
        )
        cap_origin = (state.tops == CAP)[:, None, None]
        smashable = path_tops == WALL
        plain_ok = before & passable                         # [n2, 4, n-1]
        smash_ok = before & smashable & cap_origin           # [n2, 4, n-1]

        s_idx = self.PAT_S - 1                               # [P]
        g_plain = jnp.take(plain_ok, s_idx, axis=2)          # [n2, 4, P]
        g_smash = jnp.take(smash_ok, s_idx, axis=2)
        hk = (state.heights[:, None] >= jnp.arange(1, n + 1)[None, :])
        g_height = jnp.take(hk, self.PAT_K - 1, axis=1)      # [n2, P]

        spread = (
            own[:, None, None]
            & g_height[:, None, :]
            & self.SPREAD_FITS
            & (g_plain | (g_smash & (self.PAT_LAST == 1)[None, None, :]))
        )                                                    # [n2, 4, P]

        return jnp.concatenate(
            [
                place_flat,
                place_wall,
                place_cap,
                jnp.moveaxis(spread, 0, -1).reshape(-1),  # [4, P, n2] flat
            ]
        )

    # -- step ----------------------------------------------------------------

    def step(self, state: GameState, action, enabled=None) -> GameState:
        """Apply one action (assumed legal).  No-op on finished games and,
        if `enabled` is given, on disabled games (folding the caller's
        mask into the existing freeze select compiles ~100x faster on
        this backend than wrapping the step in a second where).

        Scatter-free formulation: every square decides its own update from
        the decoded action (distance along the spread ray via PATH_DIST),
        so the whole step is fused vectorized selects — no serialized
        dynamic-update ops on the hot path.
        """
        n, n2, P, W = self.n, self.num_squares, self.num_pat, self.words
        ch, sq = action // n2, action % n2
        is_place = ch < 3
        is_origin = jnp.arange(n2) == sq                      # [n2]

        color_eff = self._effective_color(state)
        orig_top = state.tops[sq]
        h = state.heights[sq]

        # ---- spread decode (game.rs:171-209) ----
        dp = jnp.maximum(ch - 3, 0)
        d, p = dp // P, dp % P
        k = jnp.where(is_place, 0, self.PAT_K[p])
        s = self.PAT_S[p]
        lo = h - k
        carry = _read_window(state.stacks[sq], lo, k)

        # per-square drop amounts / carry segments along the ray
        dist = self.PATH_DIST[sq, d]                          # [n2]
        on_ray = (~is_place) & (dist >= 1) & (dist <= s)
        jq = jnp.maximum(dist - 1, 0)
        drops = jnp.where(on_ray, self.PAT_DROPS[p][jq], 0)   # [n2]
        cum = self.PAT_CUM[p][jq].astype(_U32)                # [n2]
        bits = (carry >> cum) & ((_U32(1) << drops.astype(_U32)) - _U32(1))

        # placement contributes a single bottom piece at the origin
        place_bits = jnp.where(is_place, color_eff, 0).astype(_U32)
        ins_bits = jnp.where(is_origin, place_bits, bits)     # [n2]
        ins_count = jnp.where(
            is_place, jnp.where(is_origin, 1, 0), drops
        )                                                     # [n2]

        # insert ins_bits at each square's current height (two-word window)
        th = state.heights
        jw = th >> 5
        off = (th & 31).astype(_U32)
        w0 = ins_bits << off
        w1 = jnp.where(
            off == 0, _U32(0),
            ins_bits >> jnp.minimum(_U32(32) - off, _U32(31)),
        )
        word_ids = jnp.arange(W)[None, :]                     # [1, W]
        add = (
            jnp.where(word_ids == jw[:, None], w0[:, None], _U32(0))
            | jnp.where(word_ids == jw[:, None] + 1, w1[:, None], _U32(0))
        )                                                     # [n2, W]

        # clear the carried window at the spread origin
        cj = jnp.maximum(lo, 0) >> 5
        coff = (lo & 31).astype(_U32)
        cmask = (_U32(1) << k.astype(_U32)) - _U32(1)
        cm0 = cmask << coff
        cm1 = jnp.where(
            coff == 0, _U32(0),
            cmask >> jnp.minimum(_U32(32) - coff, _U32(31)),
        )
        clear = (
            jnp.where(word_ids == cj, cm0, _U32(0))
            | jnp.where(word_ids == cj + 1, cm1, _U32(0))
        )
        clear = jnp.where(((~is_place) & is_origin)[:, None], clear, _U32(0))

        new_stacks = (state.stacks & ~clear) | add
        new_heights = jnp.where(
            is_origin,
            jnp.where(is_place, 1, lo),
            state.heights + ins_count,
        )
        # intermediate drops are flats; the final drop carries the moving
        # stack's top piece type; a smashed wall stays buried as a flat
        spread_top = jnp.where(dist == s, orig_top, FLAT)
        new_tops = jnp.where(
            is_origin,
            jnp.where(is_place, ch + 1, jnp.where(lo > 0, FLAT, EMPTY)),
            jnp.where(on_ray, spread_top, state.tops),
        )

        is_cap_place = is_place & (ch + 1 == CAP)
        new_stones = state.stones.at[color_eff].add(
            jnp.where(is_place & ~is_cap_place, -1, 0)
        )
        new_caps = state.caps.at[state.to_move].add(
            jnp.where(is_cap_place, -1, 0)
        )

        new = GameState(
            stacks=new_stacks,
            heights=new_heights,
            tops=new_tops,
            to_move=1 - state.to_move,
            ply=state.ply + 1,
            stones=new_stones,
            caps=new_caps,
            half_komi=state.half_komi,
            reversible=jnp.where(is_place, 0, state.reversible + 1),
            result=state.result,
        )
        new = new.replace(result=self.compute_result(new))

        # finished games (and mask-disabled games) are frozen
        done = state.result != ONGOING
        if enabled is not None:
            done = done | ~enabled
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
        return jax.jit(jax.vmap(lambda s, a: self.step(s, a)))

    @cached_property
    def batched_step_masked(self):
        """Step where `enabled`; frozen elsewhere (fast-compiling mask)."""
        return jax.jit(jax.vmap(self.step))

    @cached_property
    def batched_legal_mask(self):
        return jax.jit(jax.vmap(self.legal_mask))

    def initial_batch(self, batch: int, half_komi: int = 0) -> GameState:
        one = self.initial(half_komi)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)

    # -- fused Pallas engine kernels (see engine/pallas_env.py) ---------------

    @property
    def fused_kernels_supported(self) -> bool:
        return self.words <= 4  # sizes 3-8 (7/8 use 3/4 word planes)

    def fused_step_fn(self, *, block_g: int = 256, interpret: bool = False):
        """One-kernel (states, actions[, enabled]) -> states step+result.
        Pass `seed`-free; freezes finished/disabled games like `step`."""
        from .pallas_env import build_fused_step

        return build_fused_step(self, block_g=block_g, interpret=interpret)

    def wins_in_one_fused_fn(self, *, block_g: int = 128,
                             interpret: bool = False,
                             action_chunk: int | None = None,
                             max_rows: int = 1 << 19):
        """Batched instant-win scan through the fused step kernel:
        (states [B]) -> wins [B, A] bool.  Steps every (game, action)
        pair through the kernel (illegal pairs ride the kernel's freeze
        path), ~50x cheaper than vmapping the XLA step over B*A pairs.
        Same semantics as `wins_in_one` (self_play.rs:119-137 parity).

        Memory: a single launch materializes B*A probe rows (~1.6KB/row
        at 8x8) — fine for self-play B=32 on 6x6 (~0.5GB) and the
        playtak bot's B=1 on any size, but B=128 on the 65k-action 8x8
        space would be a 25GB program.  When B*A exceeds `max_rows`
        (default 512k rows, ~0.9GB of probe state at 8x8 — under 2GB
        live with the kernel's outputs) the scan is CHUNKED over action
        blocks with `lax.scan`, so only B*chunk probe rows are live per
        step; `action_chunk` overrides the auto-chosen block.  6x6
        self-play shapes (B<=56, A=9036) stay on the single-launch
        path.  Compiled
        parity is exercised by tools/parity_78_compiled.py.  `block_g`
        blocks the flattened row axis and must stay a multiple of 128
        (Mosaic lane rule)."""
        from ..types import result_winner
        from .pallas_env import build_fused_step

        fused = build_fused_step(self, block_g=block_g, interpret=interpret)
        A = self.num_actions

        @jax.jit
        def run(states: GameState):
            B = states.ply.shape[0]
            legal = jax.vmap(self.legal_mask)(states)           # [B, A]

            if action_chunk is not None:
                C = action_chunk
            elif B * A <= max_rows:
                C = A
            else:  # largest block_g-multiple chunk within the row budget
                C = max(block_g, (max_rows // B) // block_g * block_g)

            if C >= A:  # ---- single launch over all B*A pairs ----------
                rows = B * A
                pad = (-rows) % block_g

                def tile(x):
                    rep = jnp.repeat(x, A, axis=0)
                    if pad:
                        rep = jnp.concatenate(
                            [rep,
                             jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
                        )
                    return rep

                rep = jax.tree.map(tile, states)
                acts = jnp.tile(jnp.arange(A, dtype=jnp.int32), B)
                enabled = legal.reshape(-1)
                if pad:
                    acts = jnp.concatenate([acts, jnp.zeros(pad, jnp.int32)])
                    enabled = jnp.concatenate(
                        [enabled, jnp.zeros(pad, bool)])
                stepped = fused(rep, acts, enabled)
                winner = result_winner(stepped.result[:rows]).reshape(B, A)
                return (winner == states.to_move[:, None]) & legal

            # ---- chunked: scan over ceil(A/C) action blocks ------------
            nC = -(-A // C)
            Apad = nC * C
            legal_p = jnp.pad(legal, ((0, 0), (0, Apad - A)))
            rows = B * C
            pad = (-rows) % block_g

            def tile(x):
                rep = jnp.repeat(x, C, axis=0)
                if pad:
                    rep = jnp.concatenate(
                        [rep, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
                    )
                return rep

            rep = jax.tree.map(tile, states)  # states fixed across chunks
            base = jnp.tile(jnp.arange(C, dtype=jnp.int32), B)

            def body(_, i):
                # padded action ids clamp to A-1; enabled=False freezes
                acts = jnp.minimum(base + i * C, A - 1)
                en = jax.lax.dynamic_slice(
                    legal_p, (0, i * C), (B, C)).reshape(-1)
                if pad:
                    acts = jnp.concatenate([acts, jnp.zeros(pad, jnp.int32)])
                    en = jnp.concatenate([en, jnp.zeros(pad, bool)])
                stepped = fused(rep, acts, en)
                return None, result_winner(stepped.result[:rows]).reshape(B, C)

            _, winners = jax.lax.scan(
                body, None, jnp.arange(nC, dtype=jnp.int32))
            winner = jnp.moveaxis(winners, 0, 1).reshape(B, Apad)[:, :A]
            return (winner == states.to_move[:, None]) & legal

        return run

    def fused_step_legal_fn(self, *, block_g: int = 128,
                            interpret: bool = False):
        """One-kernel (states, actions[, enabled]) -> (states, legal
        [B, A] bool of the post-step state).  The wave's expansion needs
        exactly this pair; emitting legality from the step kernel
        replaces a whole separate XLA legal_mask pass."""
        from .pallas_env import build_fused_step_legal

        return build_fused_step_legal(self, block_g=block_g,
                                      interpret=interpret)

    def env_rollout_fn(self, num_steps: int, *, block_g: int = 256,
                       interpret: bool = False):
        """One-kernel (states, seed) -> states after `num_steps` uniform-
        random-legal steps with done-game reset (the whole env loop)."""
        from .pallas_env import build_env_rollout

        return build_env_rollout(
            self, num_steps, block_g=block_g, interpret=interpret
        )


_ENGINES: dict[int, Engine] = {}


def get_engine(n: int) -> Engine:
    if n not in _ENGINES:
        _ENGINES[n] = Engine(n)
    return _ENGINES[n]
