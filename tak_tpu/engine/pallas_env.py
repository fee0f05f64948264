"""Fused Pallas TPU kernels for the rules-engine hot paths.

Motivation (measured, see CLAUDE.md): on this backend each fused-kernel
launch costs ~140us and a jit call ~3ms, so the XLA `step` (~50 kernels)
costs ~7ms/step at B=8192 and the random-playout env loop ~19ms/step.
These kernels run the ENTIRE env loop body — legal-move enumeration,
uniform-over-legal sampling, the step, road/result detection, and
done-game reset — inside ONE kernel, with the whole T-step rollout as an
in-kernel loop: zero launch overhead on the hot path.

Semantics are identical to `engine/core.py` (itself validated against the
reference `tak` crate by perft/TPS/symmetry oracles):

  * legality matches `Engine.legal_mask` (tak/src/move_gen.rs parity),
  * the step matches `Engine.step` (game.rs:121-209),
  * results match `Engine.compute_result` (game.rs:220-263).

Layout notes (the whole point of the kernel):

  * per-square state is [n2, G] — squares on sublanes, G lockstep games
    on lanes — so per-game scalars ([1, G]) and cross-square reductions
    stay full-lane-occupancy VPU rows;
  * spread legality is computed as PACKED PATTERN-BIT WORDS: for each
    (square, direction) the set of legal drop-patterns is
    KMASK[height] & (SMASK[clear] | smash * SMASHM[clear]), where the
    K/S/last-drop class masks are tiny host-precomputed tables indexed
    by stack height and ray clearance.  One u32 lane holds 32 patterns:
    the full 4*(2^n-2)*n^2 spread mask costs ~300 vector ops total;
  * road detection is the bitboard flood fill of `Engine.roads`, with
    the four planes (white/black x from-bottom/from-left) stacked on
    sublanes ([4, G] per word) so one dilation op serves all planes;
  * uniform sampling over legal actions: per-group popcounts, an
    in-lane prefix sum over squares, and a bit-rank bisection pick the
    r-th legal action bit (r from the on-core PRNG, modulo the count).

`interpret=True` runs the kernels in Pallas interpreter mode on CPU —
used by the differential tests (tests/test_pallas_env.py) that pin these
kernels bit-exactly to the XLA engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sizes import REVERSIBLE_PLIES, num_patterns
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
_I32 = jnp.int32

# scal row layout ([SC, G] block): per-game scalars
SC_TO_MOVE, SC_PLY, SC_REV, SC_RESULT, SC_KOMI = 0, 1, 2, 3, 4
SC_STONES_W, SC_STONES_B, SC_CAPS_W, SC_CAPS_B = 5, 6, 7, 8
SC_ROWS = 9


# ---------------------------------------------------------------------------
# Host-side constant tables
# ---------------------------------------------------------------------------

def _pattern_class_tables(n: int):
    """(wp, KMASK [n+1, wp], SMASK [n, wp], SMASHM [n, wp]) u32.

    KMASK[h]  : patterns picking up <= h pieces (carry limit is already
                encoded: all patterns have k <= n).
    SMASK[c]  : patterns dropping over <= c squares (plain spread into a
                run of c leading passable squares).
    SMASHM[c] : patterns with exactly c+1 drop squares and a final drop
                of 1 (lone-cap wall smash at distance c+1).
    """
    from ..actions import pattern_mask_to_drops

    P = num_patterns(n)
    wp = -(-P // 32)
    pat_k = np.zeros(P, np.int64)
    pat_s = np.zeros(P, np.int64)
    pat_last = np.zeros(P, np.int64)
    for p in range(P):
        drops = pattern_mask_to_drops(p + 1, n)
        pat_k[p] = sum(drops)
        pat_s[p] = len(drops)
        pat_last[p] = drops[-1]

    def packed(sel):
        out = np.zeros(wp, np.uint32)
        for p in np.nonzero(sel)[0]:
            out[p // 32] |= np.uint32(1) << np.uint32(p % 32)
        return out

    kmask = np.stack([packed(pat_k <= h) for h in range(n + 1)])
    smask = np.stack([packed(pat_s <= c) for c in range(n)])
    smashm = np.stack(
        [packed((pat_s == c + 1) & (pat_last == 1)) for c in range(n)]
    )
    return wp, kmask, smask, smashm


# ---------------------------------------------------------------------------
# In-kernel helpers (all operate on [n2, G] / [1, G] arrays)
# ---------------------------------------------------------------------------

def _row_iota(n2, G):
    return jax.lax.broadcasted_iota(_I32, (n2, G), 0)


def _sum_u32(x, axis=0):
    """Reduce-sum of u32 rows (Mosaic has no unsigned reductions).  All
    call sites sum disjoint-bit or one-hot terms, so wraparound i32
    addition is bit-exact (no carries between disjoint bits)."""
    xi = jax.lax.bitcast_convert_type(x, _I32)
    return jax.lax.bitcast_convert_type(
        jnp.sum(xi, axis, keepdims=True), _U32
    )


def _shift_from(x, d, n, fill):
    """result[q] = x[q + delta_d] (the next square along d), else `fill`.

    Squares live on sublanes (axis 0, q = row*n + col).  Directions:
    0:Up(+) delta=+n, 1:Right(>) +1, 2:Down(-) -n, 3:Left(<) -1.
    """
    n2 = n * n
    G = x.shape[1]
    fill_row = jnp.full((1, G), fill, x.dtype)
    if d == 0:      # from q+n
        y = jnp.concatenate([x[n:], jnp.broadcast_to(fill_row, (n, G))], 0)
    elif d == 2:    # from q-n
        y = jnp.concatenate([jnp.broadcast_to(fill_row, (n, G)), x[:-n]], 0)
    elif d == 1:    # from q+1, invalid at col n-1
        y = jnp.concatenate([x[1:], fill_row], 0)
        col = _row_iota(n2, G) % n
        y = jnp.where(col == n - 1, fill, y)
    else:           # from q-1, invalid at col 0
        y = jnp.concatenate([fill_row, x[:-1]], 0)
        col = _row_iota(n2, G) % n
        y = jnp.where(col == 0, fill, y)
    return y


def _select_table_u32(idx, table_col):
    """One-hot select over a small host table column: idx [..., G] i32 in
    [0, len(table_col)); returns u32 of the same shape."""
    out = jnp.zeros(idx.shape, _U32)
    for v, word in enumerate(table_col):
        w = np.uint32(word)
        if w:
            out = jnp.where(idx == v, _U32(w), out)
    return out


def _nwords(engine) -> int:
    """Word planes carried through the kernels (>= 2 keeps the n<=6
    layouts bit-identical to the original two-plane kernels; sizes 7/8
    need 3/4 planes for their taller stacks)."""
    return max(2, engine.words)


def _select_word(sw, j):
    """sw[j] element-wise for a word-index array j ([..., G] i32)."""
    w = sw[0]
    for i in range(1, len(sw)):
        w = jnp.where(j == i, sw[i], w)
    return w


def _top_color(sw, heights):
    """Color bit of the top piece (garbage where empty)."""
    h1 = jnp.maximum(heights - 1, 0)
    w = _select_word(sw, h1 >> 5)
    return ((w >> (h1 & 31).astype(_U32)) & _U32(1)).astype(_I32)


def _legal_bits(n, tables, sw, heights, tops, scal):
    """Packed legal-move bits.

    Returns (place_bits [n2, G] u32 with bits 0/1/2 = flat/wall/cap,
    spread_bits: list[4][wp] of [n2, G] u32 pattern words).
    Mirrors Engine.legal_mask exactly.
    """
    wp, kmask, smask, smashm = tables
    n2 = n * n
    G = sw[0].shape[1]

    to_move = scal[SC_TO_MOVE:SC_TO_MOVE + 1]
    ply = scal[SC_PLY:SC_PLY + 1]
    opening = ply < 2
    color_eff = jnp.where(opening, 1 - to_move, to_move)
    stones_eff = jnp.where(
        color_eff == 0,
        scal[SC_STONES_W:SC_STONES_W + 1],
        scal[SC_STONES_B:SC_STONES_B + 1],
    )
    caps_mover = jnp.where(
        to_move == 0,
        scal[SC_CAPS_W:SC_CAPS_W + 1],
        scal[SC_CAPS_B:SC_CAPS_B + 1],
    )

    empty = heights == 0
    have_stones = stones_eff > 0
    have_caps = caps_mover > 0
    place = (empty & have_stones).astype(_U32)                       # flat
    place |= (empty & have_stones & ~opening).astype(_U32) << 1      # wall
    place |= (empty & have_caps & ~opening).astype(_U32) << 2       # cap

    owner = _top_color(sw, heights)
    own = (heights > 0) & (owner == to_move) & ~opening

    # NB: int chains, not bool — Mosaic cannot lower selects of i1 vectors
    pass_i = (tops <= FLAT).astype(_I32)
    wall_i = (tops == WALL).astype(_I32)
    cap_origin = tops == CAP

    # kmask select per word (shared across directions)
    km_w = [
        _select_table_u32(jnp.minimum(heights, n), kmask[:, w])
        for w in range(wp)
    ]

    spread_bits = []
    for d in range(4):
        # c = number of leading passable squares along the ray;
        # w = the first blocker (if any, on-board) is a wall
        c = jnp.zeros((n2, G), _I32)
        wall_next = jnp.zeros((n2, G), _I32)
        for _ in range(n - 1):
            p_next = _shift_from(pass_i, d, n, 0)
            c = jnp.where(p_next == 1, 1 + _shift_from(c, d, n, 0), 0)
            wall_next = jnp.where(
                p_next == 1,
                _shift_from(wall_next, d, n, 0),
                _shift_from(wall_i, d, n, 0),
            )
        smash_ok = (wall_next == 1) & cap_origin
        words = []
        for w in range(wp):
            sm = _select_table_u32(c, smask[:, w])
            sh = _select_table_u32(c, smashm[:, w])
            bits = km_w[w] & (sm | jnp.where(smash_ok, sh, _U32(0)))
            words.append(jnp.where(own, bits, _U32(0)))
        spread_bits.append(words)
    return place, spread_bits


def _lane_prefix_sum(x, n2):
    """Inclusive prefix sum along axis 0 (squares) of [n2, G] i32."""
    k = 1
    while k < n2:
        shifted = jnp.concatenate(
            [jnp.zeros((k, x.shape[1]), x.dtype), x[:-k]], 0
        )
        x = x + shifted
        k *= 2
    return x


def _nth_set_bit(word, r, nbits=32):
    """Position of the (r+1)-th set bit of `word` (u32), elementwise."""
    pos = jnp.zeros(r.shape, _I32)
    rem = r
    step = nbits // 2
    while step >= 1:
        low_mask = ((_U32(1) << (pos + step).astype(_U32)) - _U32(1)) ^ (
            (_U32(1) << pos.astype(_U32)) - _U32(1)
        )
        cnt = jax.lax.population_count(word & low_mask).astype(_I32)
        go_high = cnt <= rem
        rem = jnp.where(go_high, rem - cnt, rem)
        pos = jnp.where(go_high, pos + step, pos)
        step //= 2
    return pos


def _sample_action(n, P, wp, place_bits, spread_bits, rbits):
    """Uniform-over-legal action sample.  Returns (action [1, G] i32,
    total [1, G] i32).  Action id = ch*n2 + q (ch per actions.py)."""
    n2 = n * n
    G = place_bits.shape[1]
    qi = _row_iota(n2, G)

    # groups in action-id-friendly order: 3 placement bits, then (d, w)
    groups = []
    for b in range(3):
        groups.append(((place_bits >> b) & _U32(1), ("place", b)))
    for d in range(4):
        for w in range(wp):
            groups.append((spread_bits[d][w], ("spread", d, w)))

    counts = [jax.lax.population_count(g).astype(_I32) for g, _ in groups]
    cums = [_lane_prefix_sum(c, n2) for c in counts]
    gtots = [c[n2 - 1:n2] for c in cums]
    total = gtots[0]
    for t in gtots[1:]:
        total = total + t

    r = (rbits % jnp.maximum(total, 1).astype(_U32)).astype(_I32)

    action = jnp.zeros((1, G), _I32)
    sel_word = jnp.zeros((1, G), _U32)
    sel_rank = jnp.zeros((1, G), _I32)
    sel_base = jnp.zeros((1, G), _I32)  # ch*n2 contribution w/o bit index
    sel_q = jnp.zeros((1, G), _I32)
    is_spread_sel = jnp.zeros((1, G), jnp.bool_)
    before = jnp.zeros((1, G), _I32)
    for (gbits, meta), cnt, cum, gtot in zip(groups, counts, cums, gtots):
        rr = r - before
        inside = (rr >= 0) & (rr < gtot)
        lane_sel = inside & (cum > rr) & ((cum - cnt) <= rr)  # [n2, G]
        q_sel = jnp.sum(jnp.where(lane_sel, qi, 0), 0, keepdims=True)
        w_sel = _sum_u32(jnp.where(lane_sel, gbits, _U32(0)))
        rank = rr - jnp.sum(
            jnp.where(lane_sel, cum - cnt, 0), 0, keepdims=True
        )
        if meta[0] == "place":
            ch = meta[1]
            action = jnp.where(inside, ch * n2 + q_sel, action)
        else:
            _, d, w = meta
            base = (3 + d * P + w * 32) * n2
            sel_base = jnp.where(inside, base, sel_base)
            sel_word = jnp.where(inside, w_sel, sel_word)
            sel_rank = jnp.where(inside, rank, sel_rank)
            sel_q = jnp.where(inside, q_sel, sel_q)
            is_spread_sel = is_spread_sel | inside
        before = before + gtot

    bit = _nth_set_bit(sel_word, sel_rank)
    action = jnp.where(
        is_spread_sel, sel_base + bit * n2 + sel_q, action
    )
    return action, total


def _select_pos_from_top(mask, t, n):
    """i-coordinate of the (t+1)-th set bit of the n-bit pattern mask,
    counting from the TOP (bit n-1 is i=0).  mask [*, G] u32 broadcastable
    against t [n2, G] i32."""
    pos = jnp.zeros(t.shape, _I32)  # bits from the top already consumed
    rem = t
    step = 4  # covers n <= 8 (4+2+1 = 7 = max position)
    while step >= 1:
        # the next `width` top bits after `pos` (width clamps at the edge)
        width = jnp.minimum(step, n - pos)
        seg = (mask >> (n - pos - width).astype(_U32)) & (
            (_U32(1) << width.astype(_U32)) - _U32(1)
        )
        cnt = jax.lax.population_count(seg).astype(_I32)
        go = cnt <= rem
        rem = jnp.where(go, rem - cnt, rem)
        pos = jnp.where(go, pos + width, pos)
        step //= 2
    return pos


def _step_core(n, sw, heights, tops, scal, action):
    """One step, [n2, G] layout, mirroring Engine.step exactly.

    action [1, G] i32 (assumed legal).  Returns new
    (sw, heights, tops, scal-without-result-update).
    """
    W = len(sw)
    P = num_patterns(n)
    n2 = n * n
    G = sw[0].shape[1]
    qi = _row_iota(n2, G)

    ch = action // n2
    sq = action % n2
    is_place = ch < 3
    is_origin = qi == sq

    to_move = scal[SC_TO_MOVE:SC_TO_MOVE + 1]
    ply = scal[SC_PLY:SC_PLY + 1]
    opening = ply < 2
    color_eff = jnp.where(opening, 1 - to_move, to_move)

    orig_top = jnp.sum(jnp.where(is_origin, tops, 0), 0, keepdims=True)
    h = jnp.sum(jnp.where(is_origin, heights, 0), 0, keepdims=True)
    sw_sq = [_sum_u32(jnp.where(is_origin, s, _U32(0))) for s in sw]

    # ---- spread decode ----
    dp = jnp.maximum(ch - 3, 0)
    d, p = dp // P, dp % P
    mask = (p + 1).astype(_U32)                       # n-bit pattern mask
    tz = jax.lax.population_count((mask & (~mask + _U32(1))) - _U32(1))
    k_spread = n - tz.astype(_I32)
    s_len = jax.lax.population_count(mask).astype(_I32)
    k = jnp.where(is_place, 0, k_spread)
    lo = h - k

    # carry window: k bits at height lo from the origin's two words
    joff = jnp.maximum(lo, 0) >> 5
    off_i = jnp.maximum(lo, 0) & 31
    off = off_i.astype(_U32)
    # the <=8-bit carry window spans at most two ADJACENT words
    w0c = _select_word(sw_sq, joff)
    w1c = _select_word(sw_sq[1:] + [jnp.zeros_like(sw_sq[0])], joff)
    hi_part = jnp.where(
        off == 0, _U32(0),
        w1c << jnp.minimum(32 - off_i, 31).astype(_U32),
    )
    carry = ((w0c >> off) | hi_part) & ((_U32(1) << k.astype(_U32)) - _U32(1))

    # per-square distance along the ray (0 = not on it)
    row, col = qi // n, qi % n
    srow, scol = sq // n, sq % n
    dist = jnp.where(
        d == 0, jnp.where((col == scol) & (row > srow), row - srow, 0),
        jnp.where(
            d == 1, jnp.where((row == srow) & (col > scol), col - scol, 0),
            jnp.where(
                d == 2,
                jnp.where((col == scol) & (row < srow), srow - row, 0),
                jnp.where((row == srow) & (col < scol), scol - col, 0),
            ),
        ),
    )
    on_ray = (~is_place) & (dist >= 1) & (dist <= s_len)
    t = jnp.maximum(dist - 1, 0)
    # cum drops before square t / drop count at t, from mask bit positions
    pos_t = _select_pos_from_top(mask, t, n)
    pos_prev = _select_pos_from_top(mask, jnp.maximum(t - 1, 0), n)
    cum = jnp.where(t == 0, 0, pos_prev + 1)
    drops_all = pos_t - jnp.where(t == 0, -1, pos_prev)
    drops = jnp.where(on_ray, drops_all, 0)
    cum = jnp.where(on_ray, cum, 0)
    bits = (carry >> cum.astype(_U32)) & (
        (_U32(1) << drops.astype(_U32)) - _U32(1)
    )

    place_bits = jnp.where(is_place, color_eff, 0).astype(_U32)
    ins_bits = jnp.where(is_origin, place_bits, bits)
    ins_count = jnp.where(is_place, jnp.where(is_origin, 1, 0), drops)

    # insert ins_bits at each square's current height
    th = heights
    jw = th >> 5
    offi_i = th & 31
    offi = offi_i.astype(_U32)
    w0 = ins_bits << offi
    w1 = jnp.where(
        offi == 0, _U32(0),
        ins_bits >> jnp.minimum(32 - offi_i, 31).astype(_U32),
    )
    adds = []
    for j in range(W):
        a = jnp.where(jw == j, w0, _U32(0))
        if j >= 1:
            a = a | jnp.where(jw == j - 1, w1, _U32(0))
        adds.append(a)

    # clear the carried window at the spread origin
    cj = jnp.maximum(lo, 0) >> 5
    coff_i = jnp.maximum(lo, 0) & 31
    coff = coff_i.astype(_U32)
    cmask = (_U32(1) << k.astype(_U32)) - _U32(1)
    cm0 = cmask << coff
    cm1 = jnp.where(
        coff == 0, _U32(0),
        cmask >> jnp.minimum(32 - coff_i, 31).astype(_U32),
    )
    clr_on = (~is_place) & is_origin
    clears = []
    for j in range(W):
        c = jnp.where(clr_on & (cj == j), cm0, _U32(0))
        if j >= 1:
            c = c | jnp.where(clr_on & (cj == j - 1), cm1, _U32(0))
        clears.append(c)

    new_sw = [(s & ~c) | a for s, c, a in zip(sw, clears, adds)]
    new_heights = jnp.where(
        is_origin,
        jnp.where(is_place, 1, jnp.broadcast_to(lo, heights.shape)),
        heights + ins_count,
    )
    spread_top = jnp.where(dist == s_len, jnp.broadcast_to(orig_top, tops.shape), FLAT)
    new_tops = jnp.where(
        is_origin,
        jnp.where(is_place, ch + 1, jnp.where(lo > 0, FLAT, EMPTY)),
        jnp.where(on_ray, spread_top, tops),
    )

    # ---- scalars ----
    is_cap_place = is_place & (ch + 1 == CAP)
    is_stone_place = is_place & ~is_cap_place
    sci = jax.lax.broadcasted_iota(_I32, scal.shape, 0)
    stone_row = SC_STONES_W + color_eff          # [1, G]
    cap_row = SC_CAPS_W + to_move
    new_scal = scal - jnp.where(
        (sci == stone_row) & is_stone_place, 1, 0
    ) - jnp.where((sci == cap_row) & is_cap_place, 1, 0)
    new_scal = jnp.where(sci == SC_TO_MOVE, 1 - new_scal, new_scal)
    new_scal = jnp.where(sci == SC_PLY, new_scal + 1, new_scal)
    rev_new = jnp.where(is_place, 0, scal[SC_REV:SC_REV + 1] + 1)
    new_scal = jnp.where(
        sci == SC_REV, jnp.broadcast_to(rev_new, scal.shape), new_scal
    )
    return new_sw, new_heights, new_tops, new_scal


def _roads(n, sw, heights, tops):
    """(white_road, black_road) [1, G] bool — bitboard flood fill, four
    planes stacked on sublanes (Engine.roads semantics)."""
    n2 = n * n
    G = sw[0].shape[1]
    owner = _top_color(sw, heights)
    roady = (heights > 0) & ((tops == FLAT) | (tops == CAP))

    qi = _row_iota(n2, G)
    two = n2 > 32
    pw = _U32(1) << (qi & 31).astype(_U32)

    def pack(mask):
        lo = _sum_u32(jnp.where(mask & (qi < 32), pw, _U32(0)))
        if not two:
            return lo, jnp.zeros((1, G), _U32)
        hi = _sum_u32(jnp.where(mask & (qi >= 32), pw, _U32(0)))
        return lo, hi

    w_own = pack(roady & (owner == 0))
    b_own = pack(roady & (owner == 1))

    full = (1 << n2) - 1
    col0 = sum(1 << qq for qq in range(0, n2, n))
    colL = col0 << (n - 1)
    bottom = (1 << n) - 1
    top = bottom << (n2 - n)
    nc0 = full & ~col0
    ncl = full & ~colL

    def lo32(x):
        return _U32(x & 0xFFFFFFFF)

    def hi32(x):
        return _U32(x >> 32)


    # planes on sublanes: [4, G] (wV, wH, bV, bH)
    own_lo = jnp.concatenate([w_own[0], w_own[0], b_own[0], b_own[0]], 0)
    own_hi = jnp.concatenate([w_own[1], w_own[1], b_own[1], b_own[1]], 0)
    # planes 0/2 flood from the bottom edge, planes 1/3 from the left col
    si = jax.lax.broadcasted_iota(_I32, (4, own_lo.shape[1]), 0)
    from_bottom = si % 2 == 0
    seed_lo_m = jnp.where(from_bottom, lo32(bottom), lo32(col0))
    seed_hi_m = jnp.where(from_bottom, hi32(bottom), hi32(col0))
    lab_lo = own_lo & seed_lo_m
    lab_hi = own_hi & seed_hi_m

    def dilate(lab):
        lo, hi = lab
        a_lo = (lo << 1) & lo32(nc0)
        a_hi = ((hi << 1) | (lo >> 31)) & hi32(nc0)
        b_lo = ((lo >> 1) | (hi << 31)) & lo32(ncl)
        b_hi = (hi >> 1) & hi32(ncl)
        c_lo = lo << n
        c_hi = (hi << n) | (lo >> (32 - n))
        d_lo = (lo >> n) | (hi << (32 - n))
        d_hi = hi >> n
        nlo = (lo | a_lo | b_lo | c_lo | d_lo) & own_lo
        nhi = (hi | a_hi | b_hi | c_hi | d_hi) & own_hi
        return nlo, nhi

    def body(i, lab):
        return dilate(lab)

    lab_lo, lab_hi = jax.lax.fori_loop(0, n2, body, (lab_lo, lab_hi))

    tgt_lo_m = jnp.where(from_bottom, lo32(top), lo32(colL))
    tgt_hi_m = jnp.where(from_bottom, hi32(top), hi32(colL))
    hit = (((lab_lo & tgt_lo_m) | (lab_hi & tgt_hi_m)) != 0).astype(_I32)
    white = hit[0:1] | hit[1:2]   # [1, G] i32 0/1
    black = hit[2:3] | hit[3:4]
    return white, black


def _trunc_div2(x):
    return jnp.where(x >= 0, x // 2, -((-x) // 2))


def _compute_result(n, sw, heights, tops, scal):
    """Result code [1, G] i32 (Engine.compute_result parity)."""
    to_move = scal[SC_TO_MOVE:SC_TO_MOVE + 1]
    just_moved = 1 - to_move
    white_road, black_road = _roads(n, sw, heights, tops)  # i32 0/1
    road_jm = jnp.where(just_moved == 0, white_road, black_road)
    road_om = jnp.where(just_moved == 0, black_road, white_road)
    road_code = jnp.where(
        road_jm == 1,
        jnp.where(just_moved == 0, WHITE_ROAD, BLACK_ROAD),
        jnp.where(
            road_om == 1,
            jnp.where(to_move == 0, WHITE_ROAD, BLACK_ROAD),
            ONGOING,
        ),
    )

    out_w = (scal[SC_STONES_W:SC_STONES_W + 1] == 0) & (
        scal[SC_CAPS_W:SC_CAPS_W + 1] == 0
    )
    out_b = (scal[SC_STONES_B:SC_STONES_B + 1] == 0) & (
        scal[SC_CAPS_B:SC_CAPS_B + 1] == 0
    )
    out_of_reserves = out_w | out_b
    board_full = jnp.min(heights, 0, keepdims=True) > 0

    owner = _top_color(sw, heights)
    is_flat = tops == FLAT
    fd = jnp.sum(jnp.where(is_flat, 1 - 2 * owner, 0), 0, keepdims=True)
    half_komi = scal[SC_KOMI:SC_KOMI + 1]
    diff = fd - _trunc_div2(half_komi)
    flat_code = jnp.where(
        diff > 0,
        WHITE_FLATS,
        jnp.where(
            diff < 0,
            BLACK_FLATS,
            jnp.where(half_komi % 2 != 0, BLACK_FLATS, DRAW_FLATS),
        ),
    )
    rev_draw = scal[SC_REV:SC_REV + 1] >= REVERSIBLE_PLIES

    return jnp.where(
        road_code != ONGOING,
        road_code,
        jnp.where(
            out_of_reserves | board_full,
            flat_code,
            jnp.where(rev_draw, DRAW_REVERSIBLE, ONGOING),
        ),
    ).astype(_I32)


# ---------------------------------------------------------------------------
# Host-side packing between GameState (batch-first) and kernel layout
# ---------------------------------------------------------------------------

def _pack_states(states: GameState, nw: int):
    """GameState [B, ...] -> (s_0..s_{nw-1} [n2, B], heights, tops,
    scal [SC, B]).  Missing word planes (nw > stored words) are zero."""
    W = states.stacks.shape[-1]
    zero = jnp.zeros_like(states.stacks[:, :, 0].T)
    sw = [states.stacks[:, :, j].T if j < W else zero for j in range(nw)]
    scal = jnp.stack(
        [
            states.to_move, states.ply, states.reversible, states.result,
            states.half_komi, states.stones[:, 0], states.stones[:, 1],
            states.caps[:, 0], states.caps[:, 1],
        ]
    ).astype(_I32)
    return (*sw, states.heights.T, states.tops.T, scal)


def _unpack_states(words, *cols) -> GameState:
    sw, (heights, tops, scal) = cols[:-3], cols[-3:]
    stacks = jnp.stack([s.T for s in sw[:max(words, 1)]], -1)
    return GameState(
        stacks=stacks,
        heights=heights.T,
        tops=tops.T,
        to_move=scal[SC_TO_MOVE],
        ply=scal[SC_PLY],
        stones=jnp.stack([scal[SC_STONES_W], scal[SC_STONES_B]], -1),
        caps=jnp.stack([scal[SC_CAPS_W], scal[SC_CAPS_B]], -1),
        half_komi=scal[SC_KOMI],
        reversible=scal[SC_REV],
        result=scal[SC_RESULT],
    )


def _freeze(cond, old, new):
    return tuple(jnp.where(cond, o, nn_) for o, nn_ in zip(old, new))


# ---------------------------------------------------------------------------
# Kernel builders
# ---------------------------------------------------------------------------

def _state_specs(n2, G, nw):
    spec = lambda rows: pl.BlockSpec(
        (rows, G), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    return [spec(n2)] * (nw + 2) + [spec(SC_ROWS)]


def build_fused_step(engine, *, block_g: int = 128, interpret: bool = False):
    """run(states [B], actions [B] i32, enabled [B] bool|None) -> states.

    One kernel for step + result; finished (and disabled) games freeze.
    Drop-in replacement for vmapped Engine.step (engine/core.py step).
    """
    assert engine.words <= 4, "pallas engine kernels support sizes 3-8"
    n, n2 = engine.n, engine.num_squares
    NW = _nwords(engine)
    G = block_g

    def kernel(*refs):
        sw = [r[...] for r in refs[:NW]]
        h_r, t_r, sc_r, act_r, en_r = refs[NW:NW + 5]
        outs = refs[NW + 5:]
        heights, tops, scal = h_r[...], t_r[...], sc_r[...]
        action = act_r[...]
        enabled = en_r[...] != 0

        nsw, nh, nt, nsc = _step_core(n, sw, heights, tops, scal, action)
        res = _compute_result(n, nsw, nh, nt, nsc)
        sci = jax.lax.broadcasted_iota(_I32, nsc.shape, 0)
        nsc = jnp.where(sci == SC_RESULT, jnp.broadcast_to(res, nsc.shape), nsc)

        done = (scal[SC_RESULT:SC_RESULT + 1] != ONGOING) | ~enabled
        for j in range(NW):
            outs[j][...] = jnp.where(done, sw[j], nsw[j])
        outs[NW][...] = jnp.where(done, heights, nh)
        outs[NW + 1][...] = jnp.where(done, tops, nt)
        outs[NW + 2][...] = jnp.where(done, scal, nsc)

    def run(states: GameState, actions, enabled=None):
        B = actions.shape[0]
        assert B % G == 0, (B, G)
        packed = _pack_states(states, NW)
        if enabled is None:
            en = jnp.ones((1, B), _I32)
        else:
            en = enabled.astype(_I32)[None, :]
        act = actions.astype(_I32)[None, :]

        rowspec = lambda rows: pl.BlockSpec(
            (rows, G), lambda b: (0, b), memory_space=pltpu.VMEM
        )
        out_shapes = tuple(
            [jax.ShapeDtypeStruct((n2, B), _U32)] * NW
            + [jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((SC_ROWS, B), _I32)]
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=_state_specs(n2, G, NW) + [rowspec(1), rowspec(1)],
            out_specs=tuple(_state_specs(n2, G, NW)),
            out_shape=out_shapes,
            interpret=interpret,
        )(*packed, act, en)
        return _unpack_states(engine.words, *outs)

    return run


def unpack_legal(engine, place, spread):
    """Dense [B, A] bool legal mask from the packed kernel outputs
    (place [B, n2] u32 bits 0..2; spread [B, 4, wp, n2] u32 pattern
    words).  Reference semantics of Engine.legal_mask."""
    n2 = engine.num_squares
    P = num_patterns(engine.n)
    B = place.shape[0]
    wp = spread.shape[2]
    bits3 = (
        place[:, None, :] >> jnp.arange(3, dtype=_U32)[None, :, None]
    ) & _U32(1)
    bits32 = (
        spread[:, :, :, None, :]
        >> jnp.arange(32, dtype=_U32)[None, None, None, :, None]
    ) & _U32(1)                                       # [B, 4, wp, 32, n2]
    bitsP = bits32.reshape(B, 4, wp * 32, n2)[:, :, :P, :]
    return jnp.concatenate(
        [bits3.reshape(B, 3 * n2), bitsP.reshape(B, 4 * P * n2)], axis=1
    ).astype(bool)


def masked_topk_packed(engine, policy, place, spread, k):
    """(vals, action_ids) of the top-k LEGAL policy entries per row.

    Equivalent to top_k(where(legal, policy, -1), k) but fuses the packed
    legal words (from `build_fused_step_legal`) straight into the masked
    row: the spread channels are padded from P to wp*32 with -1 (a pad,
    not a gather), the pattern-word bit test broadcasts into the where,
    and the top-k indices are translated back to real action ids with
    pure arithmetic.  Avoids materializing either the dense bool mask or
    any [.., 32, ..] expansion separately from the masked row itself.
    """
    n2 = engine.num_squares
    P = num_patterns(engine.n)
    B = policy.shape[0]
    wp = spread.shape[2]
    W32 = wp * 32

    pol_pl = policy[:, : 3 * n2].reshape(B, 3, n2)
    bits3 = (
        place[:, None, :] >> jnp.arange(3, dtype=_U32)[None, :, None]
    ) & _U32(1)
    masked_pl = jnp.where(bits3 != 0, pol_pl, -1.0)

    pol_sp = policy[:, 3 * n2 :].reshape(B, 4, P, n2)
    pol_sp = jnp.pad(
        pol_sp, ((0, 0), (0, 0), (0, W32 - P), (0, 0)), constant_values=-1.0
    ).reshape(B, 4, wp, 32, n2)
    bit = (
        spread[:, :, :, None, :]
        >> jnp.arange(32, dtype=_U32)[None, None, None, :, None]
    ) & _U32(1)
    masked_sp = jnp.where(bit != 0, pol_sp, -1.0)

    masked = jnp.concatenate(
        [masked_pl.reshape(B, 3 * n2), masked_sp.reshape(B, 4 * W32 * n2)],
        axis=1,
    )
    vals, sidx = jax.lax.top_k(masked, k)
    # padded index -> real action id (same lexicographic order, so the
    # reference's last-max tie behavior over equal priors is preserved)
    t = sidx - 3 * n2
    d = t // (W32 * n2)
    p = (t // n2) % W32
    q = t % n2
    aidx = jnp.where(sidx < 3 * n2, sidx, (3 + d * P + p) * n2 + q)
    return vals, aidx.astype(jnp.int32)


def build_fused_step_legal(engine, *, block_g: int = 128,
                           interpret: bool = False):
    """run(states [B], actions [B] i32, enabled [B] bool|None) ->
    (new_states, place [B, n2] u32, spread [B, 4, wp, n2] u32).

    Like `build_fused_step`, but the kernel also emits the PACKED legal
    bits of the post-step (possibly frozen) state — the wave's expansion
    needs exactly this mask, and computing it where the state is already
    in registers replaces a whole separate XLA legal_mask pass
    (Engine.legal_mask parity; move_gen.rs semantics).  Consume with
    `masked_topk_packed` (hot path) or `unpack_legal` (dense mask).
    """
    assert engine.words <= 4, "pallas engine kernels support sizes 3-8"
    n, n2 = engine.n, engine.num_squares
    NW = _nwords(engine)
    P = num_patterns(n)
    tables = _pattern_class_tables(n)
    wp = tables[0]
    A = engine.num_actions
    G = block_g

    def kernel(*refs):
        sw = [r[...] for r in refs[:NW]]
        h_r, t_r, sc_r, act_r, en_r = refs[NW:NW + 5]
        outs = refs[NW + 5:]
        heights, tops, scal = h_r[...], t_r[...], sc_r[...]
        action = act_r[...]
        enabled = en_r[...] != 0

        nsw, nh, nt, nsc = _step_core(n, sw, heights, tops, scal, action)
        res = _compute_result(n, nsw, nh, nt, nsc)
        sci = jax.lax.broadcasted_iota(_I32, nsc.shape, 0)
        nsc = jnp.where(sci == SC_RESULT, jnp.broadcast_to(res, nsc.shape), nsc)

        done = (scal[SC_RESULT:SC_RESULT + 1] != ONGOING) | ~enabled
        osw = [jnp.where(done, s, ns) for s, ns in zip(sw, nsw)]
        oh = jnp.where(done, heights, nh)
        ot = jnp.where(done, tops, nt)
        osc = jnp.where(done, scal, nsc)
        for j in range(NW):
            outs[j][...] = osw[j]
        outs[NW][...] = oh
        outs[NW + 1][...] = ot
        outs[NW + 2][...] = osc

        # legality of the OUTPUT state (callers gate terminal leaves)
        place, spread = _legal_bits(n, tables, osw, oh, ot, osc)
        outs[NW + 3][...] = place
        # rows: (d * wp + w) * n2 + q
        outs[NW + 4][...] = jnp.concatenate(
            [spread[d][w] for d in range(4) for w in range(wp)], 0
        )

    def run(states: GameState, actions, enabled=None):
        B = actions.shape[0]
        assert B % G == 0, (B, G)
        packed = _pack_states(states, NW)
        if enabled is None:
            en = jnp.ones((1, B), _I32)
        else:
            en = enabled.astype(_I32)[None, :]
        act = actions.astype(_I32)[None, :]

        rowspec = lambda rows: pl.BlockSpec(
            (rows, G), lambda b: (0, b), memory_space=pltpu.VMEM
        )
        out_shapes = tuple(
            [jax.ShapeDtypeStruct((n2, B), _U32)] * NW
            + [jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((SC_ROWS, B), _I32),
               jax.ShapeDtypeStruct((n2, B), _U32),           # place bits
               jax.ShapeDtypeStruct((4 * wp * n2, B), _U32)]  # spread words
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=_state_specs(n2, G, NW) + [rowspec(1), rowspec(1)],
            out_specs=tuple(_state_specs(n2, G, NW)) + (rowspec(n2),
                                                        rowspec(4 * wp * n2)),
            out_shape=out_shapes,
            interpret=interpret,
        )(*packed, act, en)
        new_states = _unpack_states(engine.words, *outs[:NW + 3])
        place = outs[NW + 3].T                           # [B, n2]
        spread = outs[NW + 4].T.reshape(B, 4, wp, n2)    # [B, 4, wp, n2]
        return new_states, place, spread

    return run


def build_legal_sampler(engine, *, block_g: int = 128,
                        interpret: bool = False,
                        external_bits: bool = False):
    """run(states [B], seed_or_bits) -> (actions [B] i32, n_legal [B] i32).

    Uniform-over-legal-action sampling in one kernel (for tests and as a
    building block; the env rollout kernel inlines the same logic).
    With `external_bits` the second argument is a [B] u32 array instead
    of a seed (the on-core PRNG has no CPU interpreter lowering)."""
    assert engine.words <= 4, "pallas engine kernels support sizes 3-8"
    n, n2 = engine.n, engine.num_squares
    NW = _nwords(engine)
    P = num_patterns(n)
    tables = _pattern_class_tables(n)
    wp = tables[0]
    G = block_g

    def kernel(*refs):
        seed_r = refs[0]
        sw = [r[...] for r in refs[1:1 + NW]]
        h_r, t_r, sc_r = refs[1 + NW:4 + NW]
        act_o, tot_o = refs[4 + NW:]
        place, spread = _legal_bits(
            n, tables, sw, h_r[...], t_r[...], sc_r[...]
        )
        if external_bits:
            rbits = seed_r[...].astype(_U32)
        else:
            pltpu.prng_seed(seed_r[0], pl.program_id(0))
            rbits = pltpu.prng_random_bits((1, G)).astype(_U32)
        action, total = _sample_action(n, P, wp, place, spread, rbits)
        act_o[...] = action
        tot_o[...] = total

    def run(states: GameState, seed_or_bits):
        B = states.heights.shape[0]
        assert B % G == 0
        packed = _pack_states(states, NW)
        rowspec = pl.BlockSpec((1, G), lambda b: (0, b),
                               memory_space=pltpu.VMEM)
        if external_bits:
            seed_spec = rowspec
            seed_arg = jnp.asarray(seed_or_bits, _U32)[None, :]
        else:
            seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
            seed_arg = jnp.asarray([seed_or_bits], _I32)
        outs = pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[seed_spec] + _state_specs(n2, G, NW),
            out_specs=(rowspec, rowspec),
            out_shape=(
                jax.ShapeDtypeStruct((1, B), _I32),
                jax.ShapeDtypeStruct((1, B), _I32),
            ),
            interpret=interpret,
        )(seed_arg, *packed)
        act, tot = outs
        return act[0], tot[0]

    return run


def build_env_rollout(engine, num_steps: int, *, block_g: int = 128,
                      interpret: bool = False,
                      external_bits: bool = False):
    """run(states [B], seed) -> states after `num_steps` random-legal
    steps with done-game reset — the entire env loop in ONE kernel.

    With `external_bits` the second argument is a [num_steps, B] u32
    array of sampling bits (tests; no PRNG lowering on CPU)."""
    assert engine.words <= 4, "pallas engine kernels support sizes 3-8"
    n, n2 = engine.n, engine.num_squares
    NW = _nwords(engine)
    P = num_patterns(n)
    tables = _pattern_class_tables(n)
    wp = tables[0]
    G = block_g
    start_stones, start_caps = engine.start_stones, engine.start_caps

    def kernel(*refs):
        seed_r = refs[0]
        state_refs = refs[1:1 + NW + 3]
        out_refs = refs[1 + NW + 3:]
        if not external_bits:
            pltpu.prng_seed(seed_r[0], pl.program_id(0))
        sci = jax.lax.broadcasted_iota(_I32, (SC_ROWS, G), 0)

        def body(i, carry):
            sw = list(carry[:NW])
            heights, tops, scal = carry[NW:]
            place, spread = _legal_bits(n, tables, sw, heights, tops, scal)
            if external_bits:
                rbits = seed_r[pl.ds(i, 1), :].astype(_U32)
            else:
                rbits = pltpu.prng_random_bits((1, G)).astype(_U32)
            action, _total = _sample_action(n, P, wp, place, spread, rbits)

            nsw, nh, nt, nsc = _step_core(
                n, sw, heights, tops, scal, action
            )
            res = _compute_result(n, nsw, nh, nt, nsc)
            nsc = jnp.where(
                sci == SC_RESULT, jnp.broadcast_to(res, nsc.shape), nsc
            )
            # freeze games that were already finished before the step
            done_pre = scal[SC_RESULT:SC_RESULT + 1] != ONGOING
            frozen = _freeze(
                done_pre, (*sw, heights, tops, scal),
                (*nsw, nh, nt, nsc),
            )
            sw = list(frozen[:NW])
            heights, tops, scal = frozen[NW:]
            # reset finished games to the initial position (komi kept)
            done = scal[SC_RESULT:SC_RESULT + 1] != ONGOING
            sw = [jnp.where(done, _U32(0), s) for s in sw]
            heights = jnp.where(done, 0, heights)
            tops = jnp.where(done, EMPTY, tops)
            fresh = jnp.where(
                (sci == SC_STONES_W) | (sci == SC_STONES_B),
                start_stones,
                jnp.where(
                    (sci == SC_CAPS_W) | (sci == SC_CAPS_B),
                    start_caps,
                    jnp.where(sci == SC_KOMI, scal, 0),
                ),
            )
            scal = jnp.where(done, fresh, scal)
            return (*sw, heights, tops, scal)

        carry = tuple(r[...] for r in state_refs)
        carry = jax.lax.fori_loop(0, num_steps, body, carry)
        for r, v in zip(out_refs, carry):
            r[...] = v

    def run(states: GameState, seed_or_bits):
        B = states.heights.shape[0]
        assert B % G == 0
        packed = _pack_states(states, NW)
        if external_bits:
            seed_spec = pl.BlockSpec(
                (num_steps, G), lambda b: (0, b), memory_space=pltpu.VMEM
            )
            seed_arg = jnp.asarray(seed_or_bits, _U32)
        else:
            seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
            seed_arg = jnp.asarray([seed_or_bits], _I32)
        out_shapes = tuple(
            [jax.ShapeDtypeStruct((n2, B), _U32)] * NW
            + [jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((n2, B), _I32),
               jax.ShapeDtypeStruct((SC_ROWS, B), _I32)]
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[seed_spec] + _state_specs(n2, G, NW),
            out_specs=tuple(_state_specs(n2, G, NW)),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_arg, *packed)
        return _unpack_states(engine.words, *outs)

    return run
