"""Fused Pallas TPU kernels for the MCTS hot loops.

Motivation (measured on this backend, see docs/ROADMAP.md): every XLA
kernel dispatch costs ~100µs regardless of size, and the descent/backup
`lax.while_loop`s in `mcts/search.py` issue ~30 tiny ops per tree level
per wave.  These kernels collapse a whole wave's worth of tree walking
into ONE kernel launch per wave: the grid iterates over games, each
program DMAs its game's entire tree into VMEM, runs the wave's descents
(and, in the backup kernel, all value backups) sequentially in-register,
and writes the mutated arrays back.

Semantics are identical to the XLA implementation (`MCTS._descend_wave` /
`MCTS._apply_wave` backup loop), which mirrors the reference
`alpha-tak/src/search/mcts.rs`:

  * PUCT with C(N) = ln((1+N+base)/base) + init, virtual-visit-as-loss Q,
    last-max tie-breaking (mcts.rs:7-12,94-118, node.rs:33-38);
  * descents run sequentially, so descent v sees every virtual mark made
    by descents < v — the XLA path's staggered pipeline guarantees the
    same visibility, so trees agree exactly up to the order node indices
    are allocated in (and bitwise when wave_size == 1);
  * backups convert one virtual visit to a real visit per edge on the
    path and add the sign-alternating value (mcts.rs:67-91).

Layout notes: per-node scalar arrays ([M] links, expanded flags) are
reshaped to (ceil(M/128), 128) so single-element reads/writes are a
(1, 128) row blend; root arrays ([A]) are padded to (ceil(A/128), 128)
so the per-descent PUCT sweep uses full 8x128 VPU tiles.

VMEM budget: the whole per-game tree must fit (edge tier dominates at
6 * M * K * 4 bytes).  `fits_in_vmem` gates automatic use; callers fall
back to the XLA path for bigger trees.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tree import NONE, Tree

LANES = 128
_NEG_INF = float("-inf")

# VMEM per core is ~16MB less double-buffering headroom; leave slack for
# the pipeline's two in-flight game blocks.
VMEM_BUDGET_BYTES = 5 * 1024 * 1024


def _cdiv(a, b):
    return -(-a // b)


def tree_vmem_bytes(max_nodes: int, k: int, num_actions: int) -> int:
    """Approximate per-game VMEM footprint of one kernel invocation."""
    kp = _cdiv(k, LANES) * LANES  # lanes are padded to 128
    edge = 6 * max_nodes * kp * 4
    root = 7 * _cdiv(num_actions, LANES) * LANES * 4
    node = 5 * _cdiv(max_nodes, LANES) * LANES * 4
    return edge + root + node


def fits_in_vmem(max_nodes: int, k: int, num_actions: int) -> bool:
    return tree_vmem_bytes(max_nodes, k, num_actions) <= VMEM_BUDGET_BYTES


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _flat_iota(rows, lanes):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    return r * lanes + c


def _read_flat(ref, idx):
    """Scalar read from a (R, 128)-reshaped flat int array at flat `idx`."""
    r = idx // LANES
    l = idx - r * LANES
    row = ref[pl.ds(r, 1), :]
    return jnp.sum(jnp.where(_lane_iota((1, LANES)) == l, row, 0))


def _write_flat(ref, idx, val):
    r = idx // LANES
    l = idx - r * LANES
    row = ref[pl.ds(r, 1), :]
    ref[pl.ds(r, 1), :] = jnp.where(_lane_iota((1, LANES)) == l, val, row)


def _rmw_flat(ref, idx, delta):
    """Add `delta` at flat `idx`: one row read + one masked add + one
    write — no cross-lane reduction (vs _read_flat + _write_flat, which
    pays a lane-extract reduction and two dynamic slices).  The scalar
    per-descent cost of these kernels is dominated by cross-lane
    reductions and dynamic-slice issues (~100 cycles each; measured:
    5x5 and 6x6 descents cost the SAME despite 4.5x the vector work),
    so every reduction removed is a direct win."""
    r = idx // LANES
    l = idx - r * LANES
    row = ref[pl.ds(r, 1), :]
    ref[pl.ds(r, 1), :] = row + jnp.where(
        _lane_iota((1, LANES)) == l, delta, jnp.zeros_like(row)
    )


# --- packed-field codecs -----------------------------------------------
# pm packs (parent, parent_slot, expanded) into one i32 per node:
#   pm = (parent+1) << 9 | (parent_slot+1) << 1 | expanded
# so the backup walk and the eviction path read ONE flat element where
# they used to read three (parent_action is read only on the root-edge
# hop, under a branch).  Bits: parent+1 <= M <= 2048 (VMEM budget caps M
# far below 2^22), parent_slot+1 <= K <= 128, expanded 1 bit.
# epac packs (edge_child, edge_action) into one i32 per edge:
#   epac = (child+1) * SA + (action+1),  SA = next pow2 >= A+2
# so the per-level PUCT select reads one row and decodes both child and
# action from a single cross-lane reduction.


def _pm_pack(parent, parent_slot, expanded):
    return ((parent + 1) << 9) | ((parent_slot + 1) << 1) | expanded


def _pm_parent(pm):
    return (pm >> 9) - 1


def _pm_slot(pm):
    return ((pm >> 1) & 0xFF) - 1


def _pm_expanded(pm):
    return pm & 1


def _action_shift(A):
    sa = 1
    while sa < A + 2:
        sa *= 2
    return sa


def _epac_pack(child, action, SA):
    return (child + 1) * SA + (action + 1)


def _last_argmax(scores, idx_grid):
    """Index of the max; ties -> LAST index (Rust Iterator::max_by)."""
    m = jnp.max(scores)
    return jnp.max(jnp.where(scores == m, idx_grid, -1))


def _c_puct(n, base, init):
    return jnp.log((1.0 + n + base) / base) + init


_INT_INF = 2**30  # python int: jnp constants would be captured as tracers


def _victim_pair(*, M, Mr, node_n, node_virt, child_count):
    """Two coldest eviction candidates (childless, unpinned, non-root):
    min node_n, ties toward the LOWEST index (matches
    MCTS._pick_victims' top_k tie-break).  Computed ONCE per descent —
    at most one create happens per descent, and nothing that affects
    candidacy mutates between the descent's start and its create (only
    edge virtual-loss marks do) — so the pair stays valid; the second
    candidate covers the case where the first is the create's parent.

    Packed form: min over n*PK + flat_index gives the lexicographic
    (n, index) minimum in ONE reduction per candidate (two total, vs
    four in the unpacked form).  node_n is clamped so the pack cannot
    overflow; the clamp binds only for childless nodes with >~800k
    visits (unreachable at supported sim budgets) and then only relaxes
    ordering among such nodes to index order."""
    flat = _flat_iota(Mr, LANES)
    cand = (
        (child_count[...] == 0) & (node_virt[...] == 0)
        & (flat > 0) & (flat < M)
    )
    PK = Mr * LANES
    n_c = jnp.minimum(node_n[...], _INT_INF // PK - 1)
    packed = jnp.where(cand, n_c * PK + flat, _INT_INF)
    m1 = jnp.min(packed)
    have1 = m1 < _INT_INF
    v1 = m1 - (m1 // PK) * PK
    packed2 = jnp.where(flat == v1, _INT_INF, packed)
    m2 = jnp.min(packed2)
    have2 = m2 < _INT_INF
    v2 = m2 - (m2 // PK) * PK
    return v1, have1, v2, have2


def _evict_alloc(want, nf, cur, pair, *, M, K, SA, aidx,
                 node_n, child_count, pm, parent_action,
                 epac, root_child):
    """Node-slot allocation with recycling: a fresh slot while the pool
    has room, else evict the coldest candidate from `pair` (skipping
    `cur`, the node being attached to).  Eviction detaches the victim
    from its parent (edge or dense root tier) but keeps the parent
    edge's statistics: selection still sees the aggregate, the subtree
    re-materializes on demand.  Returns (slot, ok, new_nf); refs mutate
    only when evicting.  The victim's packed pm keeps its stale parent
    links (only the expanded bit clears), mirroring the XLA path, which
    leaves parent/parent_slot/parent_action stale on eviction."""
    v1, have1, v2, have2 = pair
    fresh = nf < M
    use2 = v1 == cur
    victim = jnp.where(use2, v2, v1)
    have = jnp.where(use2, have2, have1)

    @pl.when(want & ~fresh & have)
    def _():
        pmv = _read_flat(pm, victim)
        pv = _pm_parent(pmv)
        sv = _pm_slot(pmv)
        is_root_edge = (pv == 0) & (sv == NONE)

        @pl.when(is_root_edge)
        def _():
            av = _read_flat(parent_action, victim)
            root_child[...] = jnp.where(aidx == av, NONE, root_child[...])

        @pl.when(~is_root_edge)
        def _():
            # clear the child half of the packed edge, keep the action
            row = epac[pl.ds(pv, 1), :]
            epac[pl.ds(pv, 1), :] = jnp.where(
                _lane_iota((1, K)) == sv, row % SA, row
            )

        _rmw_flat(child_count, pv, -1)
        _write_flat(pm, victim, pmv - _pm_expanded(pmv))
        _write_flat(node_n, victim, 0)

    slot = jnp.where(fresh, nf, victim)
    ok = want & (fresh | have)
    new_nf = nf + jnp.where(want & fresh, 1, 0)
    return slot, ok, new_nf


# ---------------------------------------------------------------------------
# Descent kernel: one wave of V sequential virtual-loss descents per game.
# ---------------------------------------------------------------------------

def _descend_kernel(
    # inputs
    scal_ref,            # SMEM (1, 4) i32: n0, virt0, next_free, unused
    root_prior_ref,      # (Ar, 128) f32
    root_bias_ref,       # (Ar, 128) f32: 0 legal / -inf illegal+padding
    root_n_ref,          # (Ar, 128) i32
    root_w_ref,          # (Ar, 128) f32
    root_virt_in,        # (Ar, 128) i32
    root_child_in,       # (Ar, 128) i32
    epac_in,             # (M, K) i32 packed (child, action)
    edge_prior_ref,      # (M, K) f32
    edge_n_ref,          # (M, K) i32
    edge_w_ref,          # (M, K) f32
    edge_virt_in,        # (M, K) i32
    pm_in,               # (Mr, 128) i32 packed (parent, slot, expanded)
    parent_action_in,    # (Mr, 128) i32
    node_n_in,           # (Mr, 128) i32  (recycling bookkeeping)
    node_virt_in,        # (Mr, 128) i32
    child_count_in,      # (Mr, 128) i32
    # outputs
    scal_out,            # SMEM (1, 4) i32
    root_virt_out,       # (Ar, 128) i32
    root_child_out,      # (Ar, 128) i32
    edge_virt_out,       # (M, K) i32
    epac_out,            # (M, K) i32
    pm_out,              # (Mr, 128) i32
    parent_action_out,   # (Mr, 128) i32
    node_n_out,          # (Mr, 128) i32
    node_virt_out,       # (Mr, 128) i32
    child_count_out,     # (Mr, 128) i32
    leaf_ref,            # (1, V) i32
    created_ref,         # (1, V) i32
    *,
    V: int,
    M: int,
    K: int,
    Ar: int,
    Mr: int,
    SA: int,
    base: float,
    init: float,
    recycle: bool,
):
    # carry mutable state through to the outputs
    root_virt_out[...] = root_virt_in[...]
    root_child_out[...] = root_child_in[...]
    edge_virt_out[...] = edge_virt_in[...]
    epac_out[...] = epac_in[...]
    pm_out[...] = pm_in[...]
    parent_action_out[...] = parent_action_in[...]
    node_n_out[...] = node_n_in[...]
    node_virt_out[...] = node_virt_in[...]
    child_count_out[...] = child_count_in[...]
    leaf_ref[...] = jnp.zeros((1, V), jnp.int32)
    created_ref[...] = jnp.zeros((1, V), jnp.int32)

    n0 = scal_ref[0, 0]
    aidx = _flat_iota(Ar, LANES)
    kidx = _lane_iota((1, K))
    vidx = _lane_iota((1, V))

    def make_alloc():
        if not recycle:
            def alloc(want, nf, cur):
                ok = want & (nf < M)
                return nf, ok, nf + jnp.where(ok, 1, 0)

            return alloc
        pair = _victim_pair(
            M=M, Mr=Mr, node_n=node_n_out, node_virt=node_virt_out,
            child_count=child_count_out,
        )

        def alloc(want, nf, cur):
            return _evict_alloc(
                want, nf, cur, pair, M=M, K=K, SA=SA, aidx=aidx,
                node_n=node_n_out,
                child_count=child_count_out, pm=pm_out,
                parent_action=parent_action_out,
                epac=epac_out, root_child=root_child_out,
            )

        return alloc

    def one_descent(v, carry):
        virt0, next_free = carry
        alloc = make_alloc()  # victim pair scored once per descent

        # ---- root selection: dense PUCT over the full action space ----
        rv = root_virt_out[...]
        rn = root_n_ref[...]
        tot = (rn + rv).astype(jnp.float32)
        q = jnp.where(
            tot > 0,
            (root_w_ref[...] - rv.astype(jnp.float32))
            / jnp.maximum(tot, 1.0),
            0.0,
        )
        n0f = (n0 + virt0).astype(jnp.float32)
        u = (
            _c_puct(n0f, base, init)
            * root_prior_ref[...]
            * jnp.sqrt(n0f)
            / (1.0 + tot)
        )
        scores = q + u + root_bias_ref[...]
        a0 = _last_argmax(scores, aidx)
        onehot = aidx == a0
        c0 = jnp.sum(jnp.where(onehot, root_child_out[...], 0))
        nv0 = jnp.sum(jnp.where(onehot, rn + rv, 0))
        slot0, ok0, next_free = alloc(c0 == NONE, next_free, 0)
        # mark the virtual visit (pre-mark nv0, as upstream) — but only
        # when the descent can proceed: a failed rootward create
        # degrades to a root re-eval whose backup never reaches
        # this edge, so marking would leak a virtual visit per descent
        proceed0 = (c0 != NONE) | ok0
        root_virt_out[...] = root_virt_out[...] + jnp.where(
            proceed0, onehot.astype(jnp.int32), 0
        )
        virt0 = virt0 + 1

        @pl.when(ok0)
        def _():
            root_child_out[...] = jnp.where(
                onehot, slot0, root_child_out[...]
            )
            _write_flat(pm_out, slot0, _pm_pack(0, NONE, 0))
            _write_flat(parent_action_out, slot0, a0)
            if recycle:
                _rmw_flat(child_count_out, 0, 1)
                _write_flat(node_n_out, slot0,
                            jnp.sum(jnp.where(onehot, rn, 0)))

        # create failed at the root -> re-evaluate the root (leaf 0)
        leaf_v = jnp.where(ok0, slot0, 0)
        created_v = jnp.where(ok0, 1, 0)
        cur = jnp.where(ok0, NONE, c0)

        # ---- walk down the tree until a leaf resolves ------------------
        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, nv, leaf_v, created_v, nf = c
            exp = _pm_expanded(_read_flat(pm_out, cur)) != 0

            pac = epac_out[pl.ds(cur, 1), :]
            ap1 = pac % SA  # action+1 per lane; 0 = unused slot
            ev = edge_virt_out[pl.ds(cur, 1), :]
            en = edge_n_ref[pl.ds(cur, 1), :]
            tot = (en + ev).astype(jnp.float32)
            q = jnp.where(
                tot > 0,
                (edge_w_ref[pl.ds(cur, 1), :] - ev.astype(jnp.float32))
                / jnp.maximum(tot, 1.0),
                0.0,
            )
            npf = nv.astype(jnp.float32)
            u = (
                _c_puct(npf, base, init)
                * edge_prior_ref[pl.ds(cur, 1), :]
                * jnp.sqrt(npf)
                / (1.0 + tot)
            )
            scores = jnp.where(ap1 != 0, q + u, _NEG_INF)
            slot = _last_argmax(scores, kidx)
            oh = kidx == slot
            # one packed reduction decodes both child and action
            pacv = jnp.sum(jnp.where(oh, pac, 0))
            child = pacv // SA - 1
            action = pacv - (pacv // SA) * SA - 1
            cnv = jnp.sum(jnp.where(oh, en + ev, 0))

            want_create = exp & (child == NONE)
            slot_c, ok_create, nf = alloc(want_create, nf, cur)

            @pl.when(exp)
            def _():
                edge_virt_out[pl.ds(cur, 1), :] = ev + oh.astype(jnp.int32)

            @pl.when(ok_create)
            def _():
                # re-read the row: an eviction in alloc() may have
                # detached a sibling from this very row
                row = epac_out[pl.ds(cur, 1), :]
                epac_out[pl.ds(cur, 1), :] = jnp.where(
                    oh, row % SA + (slot_c + 1) * SA, row
                )
                _write_flat(pm_out, slot_c, _pm_pack(cur, slot, 0))
                _write_flat(parent_action_out, slot_c, action)
                if recycle:
                    _rmw_flat(child_count_out, cur, 1)
                    _write_flat(node_n_out, slot_c,
                                jnp.sum(jnp.where(oh, en, 0)))

            # stop at pending/terminal nodes (leaf = cur, re-evaluated),
            # on creation (leaf = new node), or failed create (leaf = cur)
            stopping = ~exp | want_create
            new_leaf = jnp.where(ok_create, slot_c, cur)
            leaf_v = jnp.where(stopping, new_leaf, leaf_v)
            created_v = jnp.where(ok_create, 1, created_v)
            nxt = jnp.where(stopping, NONE, child)
            nv = jnp.where(stopping, nv, cnv)
            return (nxt, nv, leaf_v, created_v, nf)

        cur, _, leaf_v, created_v, next_free = jax.lax.while_loop(
            wcond, wbody, (cur, nv0, leaf_v, created_v, next_free)
        )

        if recycle:
            # pin the resolved leaf until its backup releases it — keeps
            # in-flight leaves out of later descents' eviction candidates
            _rmw_flat(node_virt_out, leaf_v, 1)

        is_v = vidx == v
        leaf_ref[...] = jnp.where(is_v, leaf_v, leaf_ref[...])
        created_ref[...] = jnp.where(is_v, created_v, created_ref[...])
        return (virt0, next_free)

    virt0, next_free = jax.lax.fori_loop(
        0, V, one_descent, (scal_ref[0, 1], scal_ref[0, 2])
    )
    scal_out[0, 0] = n0
    scal_out[0, 1] = virt0
    scal_out[0, 2] = next_free
    scal_out[0, 3] = 0


# ---------------------------------------------------------------------------
# Expand+backup kernel: after the wave's NN evaluation, write each new
# leaf's top-K edge row (priors/actions, cleared stats) and run all V
# value backups — sequentially per game, one kernel launch per wave.
# ---------------------------------------------------------------------------

def _expand_backup_kernel(
    # inputs
    scal_ref,            # SMEM (1, 4) i32: n0, virt0, unused, unused
    leaves_ref,          # SMEM (1, V) i32
    values_ref,          # SMEM (1, V) f32 raw network values
    results_ref,         # SMEM (1, V) i32 leaf result codes
    tomove_ref,          # SMEM (1, V) i32 leaf side-to-move
    topk_vals_ref,       # (V, K) f32 masked top-K priors (-1 pad)
    topk_aidx_ref,       # (V, K) i32 top-K action ids
    pm_in,               # (Mr, 128) i32 packed (parent, slot, expanded)
    parent_action_ref,   # (Mr, 128) i32
    root_n_in,           # (Ar, 128) i32
    root_virt_in,        # (Ar, 128) i32
    root_w_in,           # (Ar, 128) f32
    epac_in,             # (M, K) i32 packed (child, action)
    edge_prior_in,       # (M, K) f32
    edge_n_in,           # (M, K) i32
    edge_virt_in,        # (M, K) i32
    edge_w_in,           # (M, K) f32
    node_n_in,           # (Mr, 128) i32  (recycling bookkeeping)
    node_virt_in,        # (Mr, 128) i32
    # outputs
    scal_out,            # SMEM (1, 4) i32
    pm_out,              # (Mr, 128) i32
    root_n_out,          # (Ar, 128) i32
    root_virt_out,       # (Ar, 128) i32
    root_w_out,          # (Ar, 128) f32
    epac_out,            # (M, K) i32
    edge_prior_out,      # (M, K) f32
    edge_n_out,          # (M, K) i32
    edge_virt_out,       # (M, K) i32
    edge_w_out,          # (M, K) f32
    node_n_out,          # (Mr, 128) i32
    node_virt_out,       # (Mr, 128) i32
    *,
    V: int,
    K: int,
    Ar: int,
    SA: int,
    ongoing: int,
    recycle: bool,
):
    pm_out[...] = pm_in[...]
    root_n_out[...] = root_n_in[...]
    root_virt_out[...] = root_virt_in[...]
    root_w_out[...] = root_w_in[...]
    epac_out[...] = epac_in[...]
    edge_prior_out[...] = edge_prior_in[...]
    edge_n_out[...] = edge_n_in[...]
    edge_virt_out[...] = edge_virt_in[...]
    edge_w_out[...] = edge_w_in[...]
    node_n_out[...] = node_n_in[...]
    node_virt_out[...] = node_virt_in[...]

    aidx = _flat_iota(Ar, LANES)

    def one_backup(v, carry):
        n0, virt0 = carry
        cur = leaves_ref[0, v]
        # terminal leaves back up the anchored game outcome instead of
        # the network value (mcts.rs:53-64 / MCTS._leaf_values)
        res = results_ref[0, v]
        winner = jnp.where(
            (res == 1) | (res == 3), 0,
            jnp.where((res == 2) | (res == 4), 1, -1),
        )
        term_val = jnp.where(
            winner < 0, 0.0,
            jnp.where(tomove_ref[0, v] == winner, 1.0, -1.0),
        )
        val = jnp.where(res != ongoing, term_val, values_ref[0, v])
        if recycle:
            # release the descent's in-flight pin (one per backup entry)
            _rmw_flat(node_virt_out, cur, -1)

        # ---- expansion: install the leaf's top-K prior row -------------
        # Skip terminal leaves, the root (prepare_root owns it), and
        # already-expanded rows (pool-full re-evals; duplicate pending
        # leaves would rewrite an identical row).
        was_expanded = _pm_expanded(_read_flat(pm_out, cur)) != 0
        do_expand = (
            (results_ref[0, v] == ongoing) & (cur != 0) & ~was_expanded
        )

        @pl.when(do_expand)
        def _():
            va = topk_vals_ref[pl.ds(v, 1), :]
            ai = topk_aidx_ref[pl.ds(v, 1), :]
            okm = va >= 0.0
            # child = NONE for every slot -> packed value is action+1
            epac_out[pl.ds(cur, 1), :] = jnp.where(okm, ai + 1, 0)
            edge_prior_out[pl.ds(cur, 1), :] = jnp.where(okm, va, 0.0)
            zi = jnp.zeros((1, K), jnp.int32)
            edge_n_out[pl.ds(cur, 1), :] = zi
            edge_virt_out[pl.ds(cur, 1), :] = zi
            edge_w_out[pl.ds(cur, 1), :] = jnp.zeros((1, K), jnp.float32)
            _rmw_flat(pm_out, cur, 1)  # expanded bit (known clear)

        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, sign, n0, virt0 = c
            pmv = _read_flat(pm_out, cur)
            p = _pm_parent(pmv)
            s = _pm_slot(pmv)
            is_root_edge = (p == 0) & (s == NONE)
            is_edge = (p != NONE) & ~is_root_edge
            at_root = cur == 0

            @pl.when(is_root_edge)
            def _():
                # parent_action is only needed on the root-edge hop
                a = _read_flat(parent_action_ref, cur)
                oh = aidx == a
                ohi = oh.astype(jnp.int32)
                root_n_out[...] = root_n_out[...] + ohi
                root_virt_out[...] = root_virt_out[...] - ohi
                root_w_out[...] = root_w_out[...] + jnp.where(
                    oh, sign * val, 0.0
                )

            @pl.when(is_edge)
            def _():
                row_n = edge_n_out[pl.ds(p, 1), :]
                row_v = edge_virt_out[pl.ds(p, 1), :]
                row_w = edge_w_out[pl.ds(p, 1), :]
                oh = _lane_iota(row_n.shape) == s
                ohi = oh.astype(jnp.int32)
                edge_n_out[pl.ds(p, 1), :] = row_n + ohi
                edge_virt_out[pl.ds(p, 1), :] = row_v - ohi
                edge_w_out[pl.ds(p, 1), :] = row_w + jnp.where(
                    oh, sign * val, 0.0
                )

            n0 = n0 + jnp.where(at_root, 1, 0)
            virt0 = virt0 - jnp.where(at_root, 1, 0)
            return (p, -sign, n0, virt0)

        _, _, n0, virt0 = jax.lax.while_loop(
            wcond, wbody, (cur, jnp.float32(-1.0), n0, virt0)
        )
        return (n0, virt0)

    n0, virt0 = jax.lax.fori_loop(
        0, V, one_backup, (scal_ref[0, 0], scal_ref[0, 1])
    )
    scal_out[0, 0] = n0
    scal_out[0, 1] = virt0
    scal_out[0, 2] = 0
    scal_out[0, 3] = 0


def build_expand_backup_wave(engine, config, *, interpret: bool = False):
    """Returns run(tree_b, leaves, topk_vals, topk_aidx, leaf_results,
    values, leaf_to_move) -> tree_b with every new leaf's edge row
    installed and all V backups applied — replaces the expansion scatters,
    the terminal-value override, and the lockstep backup walk of the XLA
    path with one kernel launch.  `values` are RAW network values; the
    kernel swaps in the anchored game outcome for terminal leaves."""
    from ..types import ONGOING

    V = config.wave_size
    M = config.max_nodes
    K = config.max_children
    A = engine.num_actions
    Ar = _cdiv(A, LANES)
    Mr = _cdiv(M, LANES)
    SA = _action_shift(A)
    # packed-field bit budgets: slot+1 needs 8 bits (K <= 128) and the
    # (child+1)*SA + action+1 pack must fit in i32
    assert K <= 128 and (M + 1) * SA + A + 1 < 2 ** 31, (M, K, A, SA)

    kernel = partial(
        _expand_backup_kernel, V=V, K=K, Ar=Ar, SA=SA, ongoing=int(ONGOING),
        recycle=bool(config.recycle),
    )

    vspec = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda g: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    sspec = pl.BlockSpec(
        (None, 1, 4), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    # leaves/values/results are read one scalar at a time at a dynamic
    # index -> SMEM (VMEM cannot do dynamic lane indexing)
    rowspec = lambda w: pl.BlockSpec(
        (None, 1, w), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )

    def run(tree: Tree, leaves, topk_vals, topk_aidx, leaf_results, values,
            leaf_to_move):
        B = tree.n0.shape[0]
        padA = Ar * LANES - A
        padM = Mr * LANES - M

        def to_rows(x, pad, rows, fill=0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill).reshape(
                B, rows, LANES
            )

        scal = jnp.stack(
            [tree.n0, tree.virt0, jnp.zeros_like(tree.n0),
             jnp.zeros_like(tree.n0)], -1
        )[:, None, :]
        i32 = jnp.int32
        f32 = jnp.float32
        pm = _pm_pack(tree.parent, tree.parent_slot,
                      tree.expanded.astype(i32))
        epac = _epac_pack(tree.edge_child, tree.edge_action, SA)
        out_shapes = (
            jax.ShapeDtypeStruct((B, 1, 4), i32),         # scal
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # pm
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_n
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_virt
            jax.ShapeDtypeStruct((B, Ar, LANES), f32),    # root_w
            jax.ShapeDtypeStruct((B, M, K), i32),         # epac
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_prior
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_n
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_virt
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_w
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_n
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_virt
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                sspec, rowspec(V), rowspec(V), rowspec(V), rowspec(V),
                vspec(V, K), vspec(V, K),
                vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(M, K), vspec(M, K), vspec(M, K),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES),
            ],
            out_specs=(
                sspec,
                vspec(Mr, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(M, K), vspec(M, K), vspec(M, K),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            scal,
            leaves[:, None, :],
            values.astype(f32)[:, None, :],
            leaf_results[:, None, :],
            leaf_to_move.astype(i32)[:, None, :],
            topk_vals.astype(f32), topk_aidx,
            to_rows(pm, padM, Mr),
            to_rows(tree.parent_action, padM, Mr),
            to_rows(tree.root_n, padA, Ar),
            to_rows(tree.root_virt, padA, Ar),
            to_rows(tree.root_w.astype(f32), padA, Ar),
            epac, tree.edge_prior.astype(f32),
            tree.edge_n, tree.edge_virt, tree.edge_w.astype(f32),
            to_rows(tree.node_n, padM, Mr),
            to_rows(tree.node_virt, padM, Mr),
        )
        (scal_o, pm_o, rn_o, rv_o, rw_o,
         epac_o, ep_o, en_o, ev_o, ew_o, nn_o, nvt_o) = outs

        def from_rows(x, n):
            return x.reshape(B, -1)[:, :n]

        pm_flat = from_rows(pm_o, M)
        return tree.replace(
            expanded=_pm_expanded(pm_flat).astype(bool),
            root_n=from_rows(rn_o, A),
            root_virt=from_rows(rv_o, A),
            root_w=from_rows(rw_o, A),
            edge_action=epac_o % SA - 1,
            edge_prior=ep_o,
            edge_child=epac_o // SA - 1,
            edge_n=en_o,
            edge_virt=ev_o,
            edge_w=ew_o,
            node_n=from_rows(nn_o, M),
            node_virt=from_rows(nvt_o, M),
            n0=scal_o[:, 0, 0],
            virt0=scal_o[:, 0, 1],
        )

    return run


# ---------------------------------------------------------------------------
# Merged backup+descend kernel: apply the PREVIOUS wave's expansions and
# value backups, then run this wave's descents — one kernel launch and ONE
# tree DMA round-trip instead of two.  The scan carries the pending
# evaluation results; a trailing expand_backup flushes the last wave.
# Semantics are bit-identical to expand_backup followed by descend.
# ---------------------------------------------------------------------------

def _backup_descend_kernel(
    # inputs
    scal_ref,            # SMEM (1, 4) i32: n0, virt0, next_free, valid
    leaves_ref,          # SMEM (1, V) i32   (pending wave)
    values_ref,          # SMEM (1, V) f32
    results_ref,         # SMEM (1, V) i32
    tomove_ref,          # SMEM (1, V) i32
    topk_vals_ref,       # (V, K) f32
    topk_aidx_ref,       # (V, K) i32
    root_prior_ref,      # (Ar, 128) f32
    root_bias_ref,       # (Ar, 128) f32
    root_n_in,           # (Ar, 128) i32
    root_virt_in,        # (Ar, 128) i32
    root_w_in,           # (Ar, 128) f32
    root_child_in,       # (Ar, 128) i32
    epac_in,             # (M, K) i32 packed (child, action)
    edge_prior_in,       # (M, K) f32
    edge_n_in,           # (M, K) i32
    edge_virt_in,        # (M, K) i32
    edge_w_in,           # (M, K) f32
    pm_in,               # (Mr, 128) i32 packed (parent, slot, expanded)
    parent_action_in,    # (Mr, 128) i32
    node_n_in,           # (Mr, 128) i32  (recycling bookkeeping)
    node_virt_in,        # (Mr, 128) i32
    child_count_in,      # (Mr, 128) i32
    # outputs
    scal_out,            # SMEM (1, 4) i32
    root_n_out,
    root_virt_out,
    root_w_out,
    root_child_out,
    epac_out,
    edge_prior_out,
    edge_n_out,
    edge_virt_out,
    edge_w_out,
    pm_out,
    parent_action_out,
    node_n_out,
    node_virt_out,
    child_count_out,
    leaf_ref,            # (1, V) i32
    created_ref,         # (1, V) i32
    *,
    V: int,
    M: int,
    K: int,
    Ar: int,
    Mr: int,
    SA: int,
    base: float,
    init: float,
    ongoing: int,
    recycle: bool,
):
    # carry mutable state through to the outputs
    root_n_out[...] = root_n_in[...]
    root_virt_out[...] = root_virt_in[...]
    root_w_out[...] = root_w_in[...]
    root_child_out[...] = root_child_in[...]
    epac_out[...] = epac_in[...]
    edge_prior_out[...] = edge_prior_in[...]
    edge_n_out[...] = edge_n_in[...]
    edge_virt_out[...] = edge_virt_in[...]
    edge_w_out[...] = edge_w_in[...]
    pm_out[...] = pm_in[...]
    parent_action_out[...] = parent_action_in[...]
    node_n_out[...] = node_n_in[...]
    node_virt_out[...] = node_virt_in[...]
    child_count_out[...] = child_count_in[...]
    leaf_ref[...] = jnp.zeros((1, V), jnp.int32)
    created_ref[...] = jnp.zeros((1, V), jnp.int32)

    aidx = _flat_iota(Ar, LANES)
    kidx = _lane_iota((1, K))
    vidx = _lane_iota((1, V))
    valid = scal_ref[0, 3] != 0

    # ---- phase 1: expansions + value backups of the pending wave --------
    def one_backup(v, carry):
        n0, virt0 = carry
        cur = leaves_ref[0, v]
        res = results_ref[0, v]
        winner = jnp.where(
            (res == 1) | (res == 3), 0,
            jnp.where((res == 2) | (res == 4), 1, -1),
        )
        term_val = jnp.where(
            winner < 0, 0.0,
            jnp.where(tomove_ref[0, v] == winner, 1.0, -1.0),
        )
        val = jnp.where(res != ongoing, term_val, values_ref[0, v])
        if recycle:
            # release the descent's in-flight pin (one per backup entry)
            _rmw_flat(node_virt_out, cur, -1)

        was_expanded = _pm_expanded(_read_flat(pm_out, cur)) != 0
        do_expand = (res == ongoing) & (cur != 0) & ~was_expanded

        @pl.when(do_expand)
        def _():
            va = topk_vals_ref[pl.ds(v, 1), :]
            ai = topk_aidx_ref[pl.ds(v, 1), :]
            okm = va >= 0.0
            # child = NONE for every slot -> packed value is action+1
            epac_out[pl.ds(cur, 1), :] = jnp.where(okm, ai + 1, 0)
            edge_prior_out[pl.ds(cur, 1), :] = jnp.where(okm, va, 0.0)
            zi = jnp.zeros((1, K), jnp.int32)
            edge_n_out[pl.ds(cur, 1), :] = zi
            edge_virt_out[pl.ds(cur, 1), :] = zi
            edge_w_out[pl.ds(cur, 1), :] = jnp.zeros((1, K), jnp.float32)
            _rmw_flat(pm_out, cur, 1)  # expanded bit (known clear)

        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, sign, n0, virt0 = c
            pmv = _read_flat(pm_out, cur)
            p = _pm_parent(pmv)
            s = _pm_slot(pmv)
            is_root_edge = (p == 0) & (s == NONE)
            is_edge = (p != NONE) & ~is_root_edge
            at_root = cur == 0

            @pl.when(is_root_edge)
            def _():
                # parent_action is only needed on the root-edge hop
                a = _read_flat(parent_action_out, cur)
                oh = aidx == a
                ohi = oh.astype(jnp.int32)
                root_n_out[...] = root_n_out[...] + ohi
                root_virt_out[...] = root_virt_out[...] - ohi
                root_w_out[...] = root_w_out[...] + jnp.where(
                    oh, sign * val, 0.0
                )

            @pl.when(is_edge)
            def _():
                row_n = edge_n_out[pl.ds(p, 1), :]
                row_v = edge_virt_out[pl.ds(p, 1), :]
                row_w = edge_w_out[pl.ds(p, 1), :]
                oh = _lane_iota(row_n.shape) == s
                ohi = oh.astype(jnp.int32)
                edge_n_out[pl.ds(p, 1), :] = row_n + ohi
                edge_virt_out[pl.ds(p, 1), :] = row_v - ohi
                edge_w_out[pl.ds(p, 1), :] = row_w + jnp.where(
                    oh, sign * val, 0.0
                )

            n0 = n0 + jnp.where(at_root, 1, 0)
            virt0 = virt0 - jnp.where(at_root, 1, 0)
            return (p, -sign, n0, virt0)

        _, _, n0, virt0 = jax.lax.while_loop(
            wcond, wbody, (cur, jnp.float32(-1.0), n0, virt0)
        )
        return (n0, virt0)

    # run the backup loop only when there is a pending wave; n0/virt0
    # escape the pl.when block through the SMEM output row
    scal_out[0, 0] = scal_ref[0, 0]
    scal_out[0, 1] = scal_ref[0, 1]

    @pl.when(valid)
    def _():
        n0_, virt0_ = jax.lax.fori_loop(
            0, V, one_backup, (scal_ref[0, 0], scal_ref[0, 1])
        )
        scal_out[0, 0] = n0_
        scal_out[0, 1] = virt0_

    n0 = scal_out[0, 0]
    virt0 = scal_out[0, 1]

    # ---- phase 2: this wave's V sequential virtual-loss descents ---------
    def make_alloc():
        if not recycle:
            def alloc(want, nf, cur):
                ok = want & (nf < M)
                return nf, ok, nf + jnp.where(ok, 1, 0)

            return alloc
        pair = _victim_pair(
            M=M, Mr=Mr, node_n=node_n_out, node_virt=node_virt_out,
            child_count=child_count_out,
        )

        def alloc(want, nf, cur):
            return _evict_alloc(
                want, nf, cur, pair, M=M, K=K, SA=SA, aidx=aidx,
                node_n=node_n_out,
                child_count=child_count_out, pm=pm_out,
                parent_action=parent_action_out,
                epac=epac_out, root_child=root_child_out,
            )

        return alloc

    def one_descent(v, carry):
        virt0, next_free = carry
        alloc = make_alloc()  # victim pair scored once per descent

        rv = root_virt_out[...]
        rn = root_n_out[...]
        tot = (rn + rv).astype(jnp.float32)
        q = jnp.where(
            tot > 0,
            (root_w_out[...] - rv.astype(jnp.float32))
            / jnp.maximum(tot, 1.0),
            0.0,
        )
        n0f = (n0 + virt0).astype(jnp.float32)
        u = (
            _c_puct(n0f, base, init)
            * root_prior_ref[...]
            * jnp.sqrt(n0f)
            / (1.0 + tot)
        )
        scores = q + u + root_bias_ref[...]
        a0 = _last_argmax(scores, aidx)
        onehot = aidx == a0
        c0 = jnp.sum(jnp.where(onehot, root_child_out[...], 0))
        nv0 = jnp.sum(jnp.where(onehot, rn + rv, 0))
        slot0, ok0, next_free = alloc(c0 == NONE, next_free, 0)
        # no mark on a failed rootward create (leak otherwise;
        # see _descend_kernel)
        proceed0 = (c0 != NONE) | ok0
        root_virt_out[...] = root_virt_out[...] + jnp.where(
            proceed0, onehot.astype(jnp.int32), 0
        )
        virt0 = virt0 + 1

        @pl.when(ok0)
        def _():
            root_child_out[...] = jnp.where(
                onehot, slot0, root_child_out[...]
            )
            _write_flat(pm_out, slot0, _pm_pack(0, NONE, 0))
            _write_flat(parent_action_out, slot0, a0)
            if recycle:
                _rmw_flat(child_count_out, 0, 1)
                _write_flat(node_n_out, slot0,
                            jnp.sum(jnp.where(onehot, rn, 0)))

        leaf_v = jnp.where(ok0, slot0, 0)
        created_v = jnp.where(ok0, 1, 0)
        cur = jnp.where(ok0, NONE, c0)

        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, nv, leaf_v, created_v, nf = c
            exp = _pm_expanded(_read_flat(pm_out, cur)) != 0

            pac = epac_out[pl.ds(cur, 1), :]
            ap1 = pac % SA  # action+1 per lane; 0 = unused slot
            ev = edge_virt_out[pl.ds(cur, 1), :]
            en = edge_n_out[pl.ds(cur, 1), :]
            tot = (en + ev).astype(jnp.float32)
            q = jnp.where(
                tot > 0,
                (edge_w_out[pl.ds(cur, 1), :] - ev.astype(jnp.float32))
                / jnp.maximum(tot, 1.0),
                0.0,
            )
            npf = nv.astype(jnp.float32)
            u = (
                _c_puct(npf, base, init)
                * edge_prior_out[pl.ds(cur, 1), :]
                * jnp.sqrt(npf)
                / (1.0 + tot)
            )
            scores = jnp.where(ap1 != 0, q + u, _NEG_INF)
            slot = _last_argmax(scores, kidx)
            oh = kidx == slot
            # one packed reduction decodes both child and action
            pacv = jnp.sum(jnp.where(oh, pac, 0))
            child = pacv // SA - 1
            action = pacv - (pacv // SA) * SA - 1
            cnv = jnp.sum(jnp.where(oh, en + ev, 0))

            want_create = exp & (child == NONE)
            slot_c, ok_create, nf = alloc(want_create, nf, cur)

            @pl.when(exp)
            def _():
                edge_virt_out[pl.ds(cur, 1), :] = ev + oh.astype(jnp.int32)

            @pl.when(ok_create)
            def _():
                # re-read the row: an eviction in alloc() may have
                # detached a sibling from this very row
                row = epac_out[pl.ds(cur, 1), :]
                epac_out[pl.ds(cur, 1), :] = jnp.where(
                    oh, row % SA + (slot_c + 1) * SA, row
                )
                _write_flat(pm_out, slot_c, _pm_pack(cur, slot, 0))
                _write_flat(parent_action_out, slot_c, action)
                if recycle:
                    _rmw_flat(child_count_out, cur, 1)
                    _write_flat(node_n_out, slot_c,
                                jnp.sum(jnp.where(oh, en, 0)))

            stopping = ~exp | want_create
            new_leaf = jnp.where(ok_create, slot_c, cur)
            leaf_v = jnp.where(stopping, new_leaf, leaf_v)
            created_v = jnp.where(ok_create, 1, created_v)
            nxt = jnp.where(stopping, NONE, child)
            nv = jnp.where(stopping, nv, cnv)
            return (nxt, nv, leaf_v, created_v, nf)

        cur, _, leaf_v, created_v, next_free = jax.lax.while_loop(
            wcond, wbody, (cur, nv0, leaf_v, created_v, next_free)
        )

        if recycle:
            # pin the resolved leaf until its backup releases it
            _rmw_flat(node_virt_out, leaf_v, 1)

        is_v = vidx == v
        leaf_ref[...] = jnp.where(is_v, leaf_v, leaf_ref[...])
        created_ref[...] = jnp.where(is_v, created_v, created_ref[...])
        return (virt0, next_free)

    virt0, next_free = jax.lax.fori_loop(
        0, V, one_descent, (virt0, scal_ref[0, 2])
    )
    scal_out[0, 0] = n0
    scal_out[0, 1] = virt0
    scal_out[0, 2] = next_free
    scal_out[0, 3] = 0


def build_backup_descend_wave(engine, config, *, interpret: bool = False):
    """Returns run(tree_b, pending) -> (tree_b, leaves, created) where
    `pending` is (leaves [B,V], topk_vals [B,V,K], topk_aidx [B,V,K],
    leaf_results [B,V], values [B,V], leaf_to_move [B,V], valid [] i32).
    With valid=0 the backup phase is skipped (first wave)."""
    from ..types import ONGOING

    V = config.wave_size
    M = config.max_nodes
    K = config.max_children
    A = engine.num_actions
    Ar = _cdiv(A, LANES)
    Mr = _cdiv(M, LANES)
    SA = _action_shift(A)
    # packed-field bit budgets: slot+1 needs 8 bits (K <= 128) and the
    # (child+1)*SA + action+1 pack must fit in i32
    assert K <= 128 and (M + 1) * SA + A + 1 < 2 ** 31, (M, K, A, SA)

    kernel = partial(
        _backup_descend_kernel,
        V=V, M=M, K=K, Ar=Ar, Mr=Mr, SA=SA,
        base=float(config.exploration_base),
        init=float(config.exploration_init),
        ongoing=int(ONGOING),
        recycle=bool(config.recycle),
    )

    vspec = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda g: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    sspec = pl.BlockSpec(
        (None, 1, 4), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    rowspec = lambda w: pl.BlockSpec(
        (None, 1, w), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    ospec2 = lambda w: pl.BlockSpec(
        (None, 1, w), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    def run(tree: Tree, pending):
        (p_leaves, p_vals, p_aidx, p_results, p_values, p_tomove,
         valid) = pending
        B = tree.n0.shape[0]
        padA = Ar * LANES - A
        padM = Mr * LANES - M

        def to_rows(x, pad, rows, fill=0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill).reshape(
                B, rows, LANES
            )

        scal = jnp.stack(
            [tree.n0, tree.virt0, tree.next_free,
             jnp.broadcast_to(valid.astype(jnp.int32), tree.n0.shape)], -1
        )[:, None, :]
        root_bias = jnp.where(tree.root_legal, 0.0, _NEG_INF)

        f32 = jnp.float32
        i32 = jnp.int32
        pm = _pm_pack(tree.parent, tree.parent_slot,
                      tree.expanded.astype(i32))
        epac = _epac_pack(tree.edge_child, tree.edge_action, SA)
        out_shapes = (
            jax.ShapeDtypeStruct((B, 1, 4), i32),         # scal
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_n
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_virt
            jax.ShapeDtypeStruct((B, Ar, LANES), f32),    # root_w
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_child
            jax.ShapeDtypeStruct((B, M, K), i32),         # epac
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_prior
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_n
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_virt
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_w
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # pm
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # parent_action
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_n
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_virt
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # child_count
            jax.ShapeDtypeStruct((B, 1, V), i32),         # leaf
            jax.ShapeDtypeStruct((B, 1, V), i32),         # created
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                sspec,
                rowspec(V), rowspec(V), rowspec(V), rowspec(V),
                vspec(V, K), vspec(V, K),
                vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(Ar, LANES),
                vspec(M, K), vspec(M, K), vspec(M, K),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES), vspec(Mr, LANES),
            ],
            out_specs=(
                sspec,
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(Ar, LANES),
                vspec(M, K), vspec(M, K), vspec(M, K),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES), vspec(Mr, LANES),
                ospec2(V), ospec2(V),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            scal,
            p_leaves[:, None, :],
            p_values.astype(f32)[:, None, :],
            p_results[:, None, :],
            p_tomove.astype(i32)[:, None, :],
            p_vals.astype(f32), p_aidx,
            to_rows(tree.root_prior.astype(f32), padA, Ar),
            to_rows(root_bias, padA, Ar, fill=_NEG_INF),
            to_rows(tree.root_n, padA, Ar),
            to_rows(tree.root_virt, padA, Ar),
            to_rows(tree.root_w.astype(f32), padA, Ar),
            to_rows(tree.root_child, padA, Ar, fill=NONE),
            epac, tree.edge_prior.astype(f32),
            tree.edge_n, tree.edge_virt, tree.edge_w.astype(f32),
            to_rows(pm, padM, Mr),
            to_rows(tree.parent_action, padM, Mr),
            to_rows(tree.node_n, padM, Mr),
            to_rows(tree.node_virt, padM, Mr),
            to_rows(tree.child_count, padM, Mr),
        )
        (scal_o, rn_o, rv_o, rw_o, rc_o,
         epac_o, ep_o, en_o, ev_o, ew_o,
         pm_o, pa_o, nn_o, nvt_o, cc_o, leaf, created) = outs

        def from_rows(x, n):
            return x.reshape(B, -1)[:, :n]

        pm_flat = from_rows(pm_o, M)
        tree = tree.replace(
            root_n=from_rows(rn_o, A),
            root_virt=from_rows(rv_o, A),
            root_w=from_rows(rw_o, A),
            root_child=from_rows(rc_o, A),
            edge_action=epac_o % SA - 1,
            edge_prior=ep_o,
            edge_child=epac_o // SA - 1,
            edge_n=en_o,
            edge_virt=ev_o,
            edge_w=ew_o,
            expanded=_pm_expanded(pm_flat).astype(bool),
            parent=_pm_parent(pm_flat),
            parent_slot=_pm_slot(pm_flat),
            parent_action=from_rows(pa_o, M),
            node_n=from_rows(nn_o, M),
            node_virt=from_rows(nvt_o, M),
            child_count=from_rows(cc_o, M),
            n0=scal_o[:, 0, 0],
            virt0=scal_o[:, 0, 1],
            next_free=scal_o[:, 0, 2],
        )
        return tree, leaf[:, 0, :], created[:, 0, :].astype(bool)

    return run


def build_descend_wave(engine, config, *, interpret: bool = False):
    """Returns run(tree_b) -> (tree_b, leaves [B,V] i32, created [B,V] bool),
    a drop-in replacement for vmap(MCTS._descend_wave)."""
    V = config.wave_size
    M = config.max_nodes
    K = config.max_children
    A = engine.num_actions
    Ar = _cdiv(A, LANES)
    Mr = _cdiv(M, LANES)
    SA = _action_shift(A)
    # packed-field bit budgets: slot+1 needs 8 bits (K <= 128) and the
    # (child+1)*SA + action+1 pack must fit in i32
    assert K <= 128 and (M + 1) * SA + A + 1 < 2 ** 31, (M, K, A, SA)

    kernel = partial(
        _descend_kernel,
        V=V, M=M, K=K, Ar=Ar, Mr=Mr, SA=SA,
        base=float(config.exploration_base),
        init=float(config.exploration_init),
        recycle=bool(config.recycle),
    )

    vspec = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda g: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    # Mosaic wants the trailing two block dims to equal the array dims (or
    # be 8/128-aligned); give the per-game scalar/vector rows a unit axis.
    sspec = pl.BlockSpec(
        (None, 1, 4), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    ospec2 = lambda w: pl.BlockSpec(
        (None, 1, w), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    def run(tree: Tree):
        B = tree.n0.shape[0]
        padA = Ar * LANES - A
        padM = Mr * LANES - M

        def to_rows(x, pad, rows, fill=0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill).reshape(
                B, rows, LANES
            )

        scal = jnp.stack(
            [tree.n0, tree.virt0, tree.next_free, jnp.zeros_like(tree.n0)], -1
        )[:, None, :]
        root_bias = jnp.where(tree.root_legal, 0.0, _NEG_INF)

        f32 = jnp.float32
        i32 = jnp.int32
        pm = _pm_pack(tree.parent, tree.parent_slot,
                      tree.expanded.astype(i32))
        epac = _epac_pack(tree.edge_child, tree.edge_action, SA)
        out_shapes = (
            jax.ShapeDtypeStruct((B, 1, 4), i32),         # scal
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_virt
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_child
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_virt
            jax.ShapeDtypeStruct((B, M, K), i32),         # epac
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # pm
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # parent_action
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_n
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # node_virt
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # child_count
            jax.ShapeDtypeStruct((B, 1, V), i32),         # leaf
            jax.ShapeDtypeStruct((B, 1, V), i32),         # created
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                sspec,
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(M, K), vspec(M, K), vspec(M, K),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
            ],
            out_specs=(
                sspec,
                vspec(Ar, LANES), vspec(Ar, LANES),
                vspec(M, K), vspec(M, K),
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES), vspec(Mr, LANES),
                ospec2(V), ospec2(V),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(
            scal,
            to_rows(tree.root_prior.astype(f32), padA, Ar),
            to_rows(root_bias, padA, Ar, fill=_NEG_INF),
            to_rows(tree.root_n, padA, Ar),
            to_rows(tree.root_w.astype(f32), padA, Ar),
            to_rows(tree.root_virt, padA, Ar),
            to_rows(tree.root_child, padA, Ar, fill=NONE),
            epac, tree.edge_prior.astype(f32), tree.edge_n,
            tree.edge_w.astype(f32), tree.edge_virt,
            to_rows(pm, padM, Mr),
            to_rows(tree.parent_action, padM, Mr),
            to_rows(tree.node_n, padM, Mr),
            to_rows(tree.node_virt, padM, Mr),
            to_rows(tree.child_count, padM, Mr),
        )
        (scal_o, rv_o, rc_o, ev_o, epac_o, pm_o, pa_o,
         nn_o, nvt_o, cc_o, leaf, created) = outs

        def from_rows(x, n):
            return x.reshape(B, -1)[:, :n]

        pm_flat = from_rows(pm_o, M)
        tree = tree.replace(
            root_virt=from_rows(rv_o, A),
            root_child=from_rows(rc_o, A),
            edge_virt=ev_o,
            edge_child=epac_o // SA - 1,
            edge_action=epac_o % SA - 1,
            expanded=_pm_expanded(pm_flat).astype(bool),
            parent=_pm_parent(pm_flat),
            parent_slot=_pm_slot(pm_flat),
            parent_action=from_rows(pa_o, M),
            node_n=from_rows(nn_o, M),
            node_virt=from_rows(nvt_o, M),
            child_count=from_rows(cc_o, M),
            virt0=scal_o[:, 0, 1],
            next_free=scal_o[:, 0, 2],
        )
        return tree, leaf[:, 0, :], created[:, 0, :].astype(bool)

    return run
