"""HBM-resident fused MCTS kernels for trees too big for VMEM.

`pallas_ops.py`'s kernels DMA each game's ENTIRE tree into VMEM, which
caps the node pool at ~1.5k nodes (bench-size searches).  The production
configurations need far more — self-play runs the reference's 10,000
rollouts per move (`train/src/self_play.rs:12`, node budget 20k) and the
interactive Player ponders under a 50k-rollout cap
(`playtak/src/main.rs:32`, budget >100k) — and previously fell back to
the XLA tree-walk, whose cost is ~30 dispatches x ~100us per tree level
per wave on this backend.

These kernels keep the edge tier ([M, K] per game — the only tier that
scales with the node pool) in HBM and DMA exactly the rows a descent
touches into VMEM scratch (6 x ~256B per tree level), while the small
root tier ([A]) and node-scalar tier ([M] links, reshaped (ceil(M/128),
128)) still ride the normal VMEM block pipeline.  Semantics are
IDENTICAL to the VMEM kernels (same PUCT, virtual-loss-as-loss Q,
last-max ties, terminal anchoring — see pallas_ops.py's docstring for
the reference file:line map); only row access changes:

  * reads:  6 parallel async copies per level (one per edge array),
  * writes: synchronous row copies back, completing before the walk
    advances, so later descents of the same wave observe them —
    matching the sequential-descent semantics exactly.

The mutated edge arrays are input/output-ALIASED, so untouched rows are
never copied and the kernels' HBM traffic is proportional to the nodes
actually visited, not to the pool size.

Crossover: per-row DMAs serialize within each grid step, so this path
wins when (games x descents x depth) is latency-tolerable — interactive
search (B=1), pit/self-play batches (B<=~128) — while the VMEM kernels
keep the high-throughput bench configs.  `MCTS._resolve_backend` picks
automatically: VMEM kernels when the tree fits, these otherwise, XLA as
the final fallback (and always on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ops import (
    LANES,
    _NEG_INF,
    _c_puct,
    _cdiv,
    _flat_iota,
    _lane_iota,
    _last_argmax,
    _read_flat,
    _write_flat,
)
from .tree import NONE, Tree

# Node-scalar tier (7 (Mr, 128) i32 arrays) must fit the VMEM block
# pipeline with headroom for the root tier and scratch.
MAX_HBM_NODES = 140_000

# Hot top-of-tree cache: the first CACHE_ROWS node rows of each edge
# array are bulk-DMA'd into VMEM scratch at kernel start, served from
# VMEM during the walk (no per-row DMA latency; node allocation order
# correlates with depth, so shallow/hot nodes live here), and flushed
# back in one bulk copy at kernel end.  6 arrays x 512 x K(128) x 4B
# ~ 1.6MB of scratch.  Measured at the reference self-play config:
# T=512/1024 -> 12.3k/12.2k sims/s (baseline 10.5k); T=2048 collapses
# to 7.2k (the 6.3MB scratch breaks the grid pipeline).
CACHE_ROWS = 512


def fits_hbm(max_nodes: int, k: int = LANES) -> bool:
    # Mosaic requires the per-row HBM slices to be lane-aligned: the edge
    # tier's trailing dim K must be a multiple of 128 for this tier
    # (interpret mode does not enforce this — compiled TPU does).
    return max_nodes <= MAX_HBM_NODES and k % LANES == 0


def _fetch_rows(sems, pairs):
    """Start parallel row DMAs (src, dst) and wait for all of them."""
    copies = [
        pltpu.make_async_copy(src, dst, sems.at[i])
        for i, (src, dst) in enumerate(pairs)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


# ---------------------------------------------------------------------------
# Descent kernel (HBM edge tier)
# ---------------------------------------------------------------------------

def _descend_kernel_hbm(
    # inputs
    scal_ref,            # SMEM (1, 4) i32: n0, virt0, next_free, unused
    root_prior_ref,      # (Ar, 128) f32
    root_bias_ref,       # (Ar, 128) f32
    root_n_ref,          # (Ar, 128) i32
    root_w_ref,          # (Ar, 128) f32
    root_virt_in,        # (Ar, 128) i32
    root_child_in,       # (Ar, 128) i32
    edge_action_hbm,     # ANY [B, M, K] i32
    edge_prior_hbm,      # ANY [B, M, K] f32
    edge_n_hbm,          # ANY [B, M, K] i32
    edge_w_hbm,          # ANY [B, M, K] f32
    edge_virt_hbm,       # ANY [B, M, K] i32 (aliased -> out)
    edge_child_hbm,      # ANY [B, M, K] i32 (aliased -> out)
    expanded_ref,        # (Mr, 128) i32
    parent_in,           # (Mr, 128) i32
    parent_slot_in,      # (Mr, 128) i32
    parent_action_in,    # (Mr, 128) i32
    # outputs
    scal_out,            # SMEM (1, 4) i32
    root_virt_out,       # (Ar, 128) i32
    root_child_out,      # (Ar, 128) i32
    edge_virt_out,       # ANY [B, M, K] i32 (alias of edge_virt_hbm)
    edge_child_out,      # ANY [B, M, K] i32 (alias of edge_child_hbm)
    parent_out,          # (Mr, 128) i32
    parent_slot_out,     # (Mr, 128) i32
    parent_action_out,   # (Mr, 128) i32
    leaf_ref,            # (1, V) i32
    created_ref,         # (1, V) i32
    # scratch
    s_ea, s_ep, s_en, s_ew, s_ev, s_ec,   # (1, K) rows
    c_ea, c_ep, c_en, c_ew, c_ev, c_ec,   # (T, K) hot-row caches
    sems,                # DMA semaphores (6,)
    *,
    V: int,
    M: int,
    K: int,
    Ar: int,
    T: int,
    base: float,
    init: float,
):
    del edge_virt_hbm, edge_child_hbm  # use the aliased output refs
    g = pl.program_id(0)

    root_virt_out[...] = root_virt_in[...]
    root_child_out[...] = root_child_in[...]
    parent_out[...] = parent_in[...]
    parent_slot_out[...] = parent_slot_in[...]
    parent_action_out[...] = parent_action_in[...]
    leaf_ref[...] = jnp.zeros((1, V), jnp.int32)
    created_ref[...] = jnp.zeros((1, V), jnp.int32)

    # load the hot top-of-tree into VMEM (one bulk DMA per array)
    _fetch_rows(sems, [
        (edge_action_hbm.at[g, pl.ds(0, T), :], c_ea),
        (edge_prior_hbm.at[g, pl.ds(0, T), :], c_ep),
        (edge_n_hbm.at[g, pl.ds(0, T), :], c_en),
        (edge_w_hbm.at[g, pl.ds(0, T), :], c_ew),
        (edge_virt_out.at[g, pl.ds(0, T), :], c_ev),
        (edge_child_out.at[g, pl.ds(0, T), :], c_ec),
    ])

    n0 = scal_ref[0, 0]
    aidx = _flat_iota(Ar, LANES)
    kidx = _lane_iota((1, K))
    vidx = _lane_iota((1, V))

    def one_descent(v, carry):
        virt0, next_free = carry

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
        # no mark on a pool-full rootward create failure (leak otherwise;
        # see pallas_ops._descend_kernel)
        proceed0 = (c0 != NONE) | (next_free < M)
        root_virt_out[...] = rv + jnp.where(
            proceed0, onehot.astype(jnp.int32), 0
        )
        virt0 = virt0 + 1

        create0 = (c0 == NONE) & (next_free < M)

        @pl.when(create0)
        def _():
            root_child_out[...] = jnp.where(
                onehot, next_free, root_child_out[...]
            )
            _write_flat(parent_out, next_free, 0)
            _write_flat(parent_slot_out, next_free, NONE)
            _write_flat(parent_action_out, next_free, a0)

        leaf_v = jnp.where(create0, next_free, 0)
        created_v = jnp.where(create0, 1, 0)
        next_free = next_free + jnp.where(create0, 1, 0)
        cur = jnp.where(create0, NONE, c0)

        # ---- walk down: DMA cur's edge rows, PUCT, write marks back ----
        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, nv, leaf_v, created_v, nf = c
            exp = _read_flat(expanded_ref, cur) != 0

            hot = cur < T
            cc = jnp.minimum(cur, T - 1)

            @pl.when(~hot)
            def _():
                _fetch_rows(sems, [
                    (edge_action_hbm.at[g, pl.ds(cur, 1), :], s_ea),
                    (edge_prior_hbm.at[g, pl.ds(cur, 1), :], s_ep),
                    (edge_n_hbm.at[g, pl.ds(cur, 1), :], s_en),
                    (edge_w_hbm.at[g, pl.ds(cur, 1), :], s_ew),
                    (edge_virt_out.at[g, pl.ds(cur, 1), :], s_ev),
                    (edge_child_out.at[g, pl.ds(cur, 1), :], s_ec),
                ])

            def pick(cache, row):
                return jnp.where(hot, cache[pl.ds(cc, 1), :], row[...])

            ea = pick(c_ea, s_ea)
            ep = pick(c_ep, s_ep)
            en = pick(c_en, s_en)
            ew = pick(c_ew, s_ew)
            ev = pick(c_ev, s_ev)
            ec = pick(c_ec, s_ec)
            tot = (en + ev).astype(jnp.float32)
            q = jnp.where(
                tot > 0,
                (ew - ev.astype(jnp.float32)) / jnp.maximum(tot, 1.0),
                0.0,
            )
            npf = nv.astype(jnp.float32)
            u = (
                _c_puct(npf, base, init)
                * ep
                * jnp.sqrt(npf)
                / (1.0 + tot)
            )
            scores = jnp.where(ea != NONE, q + u, _NEG_INF)
            slot = _last_argmax(scores, kidx)
            oh = kidx == slot
            action = jnp.sum(jnp.where(oh, ea, 0))
            child = jnp.sum(jnp.where(oh, ec, 0))
            cnv = jnp.sum(jnp.where(oh, en + ev, 0))

            want_create = exp & (child == NONE)
            ok_create = want_create & (nf < M)

            @pl.when(exp & hot)
            def _():
                c_ev[pl.ds(cc, 1), :] = ev + oh.astype(jnp.int32)

            @pl.when(exp & ~hot)
            def _():
                s_ev[...] = ev + oh.astype(jnp.int32)
                pltpu.sync_copy(s_ev, edge_virt_out.at[g, pl.ds(cur, 1), :])

            @pl.when(ok_create)
            def _():
                _write_flat(parent_out, nf, cur)
                _write_flat(parent_slot_out, nf, slot)
                _write_flat(parent_action_out, nf, action)

            @pl.when(ok_create & hot)
            def _():
                c_ec[pl.ds(cc, 1), :] = jnp.where(oh, nf, ec)

            @pl.when(ok_create & ~hot)
            def _():
                s_ec[...] = jnp.where(oh, nf, ec)
                pltpu.sync_copy(s_ec, edge_child_out.at[g, pl.ds(cur, 1), :])

            stopping = ~exp | want_create
            new_leaf = jnp.where(ok_create, nf, cur)
            leaf_v = jnp.where(stopping, new_leaf, leaf_v)
            created_v = jnp.where(ok_create, 1, created_v)
            nf = nf + jnp.where(ok_create, 1, 0)
            nxt = jnp.where(stopping, NONE, child)
            nv = jnp.where(stopping, nv, cnv)
            return (nxt, nv, leaf_v, created_v, nf)

        cur, _, leaf_v, created_v, next_free = jax.lax.while_loop(
            wcond, wbody, (cur, nv0, leaf_v, created_v, next_free)
        )

        is_v = vidx == v
        leaf_ref[...] = jnp.where(is_v, leaf_v, leaf_ref[...])
        created_ref[...] = jnp.where(is_v, created_v, created_ref[...])
        return (virt0, next_free)

    virt0, next_free = jax.lax.fori_loop(
        0, V, one_descent, (scal_ref[0, 1], scal_ref[0, 2])
    )
    # flush the mutated hot rows back (virt marks + created children)
    pltpu.sync_copy(c_ev, edge_virt_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_ec, edge_child_out.at[g, pl.ds(0, T), :])
    scal_out[0, 0] = n0
    scal_out[0, 1] = virt0
    scal_out[0, 2] = next_free
    scal_out[0, 3] = 0


def build_descend_wave_hbm(engine, config, *, interpret: bool = False):
    """Drop-in for `build_descend_wave` with the edge tier kept in HBM."""
    V = config.wave_size
    M = config.max_nodes
    K = config.max_children
    A = engine.num_actions
    Ar = _cdiv(A, LANES)
    Mr = _cdiv(M, LANES)
    T = min(M, CACHE_ROWS)

    kernel = partial(
        _descend_kernel_hbm,
        V=V, M=M, K=K, Ar=Ar, T=T,
        base=float(config.exploration_base),
        init=float(config.exploration_init),
    )

    vspec = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda g: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    sspec = pl.BlockSpec(
        (None, 1, 4), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    ospec2 = lambda w: pl.BlockSpec(
        (None, 1, w), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)

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
        out_shapes = (
            jax.ShapeDtypeStruct((B, 1, 4), i32),         # scal
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_virt
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_child
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_virt (alias)
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_child (alias)
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # parent
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # parent_slot
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # parent_action
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
                hbm, hbm, hbm, hbm, hbm, hbm,
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES),
            ],
            out_specs=(
                sspec,
                vspec(Ar, LANES), vspec(Ar, LANES),
                hbm, hbm,
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                ospec2(V), ospec2(V),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((1, K), i32), pltpu.VMEM((1, K), f32),
                pltpu.VMEM((1, K), i32), pltpu.VMEM((1, K), f32),
                pltpu.VMEM((1, K), i32), pltpu.VMEM((1, K), i32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), f32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), f32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), i32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            input_output_aliases={11: 3, 12: 4},
            interpret=interpret,
        )(
            scal,
            to_rows(tree.root_prior.astype(f32), padA, Ar),
            to_rows(root_bias, padA, Ar, fill=_NEG_INF),
            to_rows(tree.root_n, padA, Ar),
            to_rows(tree.root_w.astype(f32), padA, Ar),
            to_rows(tree.root_virt, padA, Ar),
            to_rows(tree.root_child, padA, Ar, fill=NONE),
            tree.edge_action, tree.edge_prior.astype(f32), tree.edge_n,
            tree.edge_w.astype(f32), tree.edge_virt, tree.edge_child,
            to_rows(tree.expanded.astype(i32), padM, Mr),
            to_rows(tree.parent, padM, Mr),
            to_rows(tree.parent_slot, padM, Mr),
            to_rows(tree.parent_action, padM, Mr),
        )
        (scal_o, rv_o, rc_o, ev_o, ec_o, p_o, ps_o, pa_o, leaf, created) = outs

        def from_rows(x, n):
            return x.reshape(B, -1)[:, :n]

        tree = tree.replace(
            root_virt=from_rows(rv_o, A),
            root_child=from_rows(rc_o, A),
            edge_virt=ev_o,
            edge_child=ec_o,
            parent=from_rows(p_o, M),
            parent_slot=from_rows(ps_o, M),
            parent_action=from_rows(pa_o, M),
            virt0=scal_o[:, 0, 1],
            next_free=scal_o[:, 0, 2],
        )
        return tree, leaf[:, 0, :], created[:, 0, :].astype(bool)

    return run


# ---------------------------------------------------------------------------
# Expand+backup kernel (HBM edge tier)
# ---------------------------------------------------------------------------

def _expand_backup_kernel_hbm(
    # inputs
    scal_ref,            # SMEM (1, 4) i32: n0, virt0
    leaves_ref,          # SMEM (1, V) i32
    values_ref,          # SMEM (1, V) f32
    results_ref,         # SMEM (1, V) i32
    tomove_ref,          # SMEM (1, V) i32
    topk_vals_ref,       # (V, K) f32
    topk_aidx_ref,       # (V, K) i32
    parent_ref,          # (Mr, 128) i32
    parent_slot_ref,     # (Mr, 128) i32
    parent_action_ref,   # (Mr, 128) i32
    expanded_in,         # (Mr, 128) i32
    root_n_in,           # (Ar, 128) i32
    root_virt_in,        # (Ar, 128) i32
    root_w_in,           # (Ar, 128) f32
    edge_action_hbm,     # ANY [B, M, K] i32 (aliased)
    edge_prior_hbm,      # ANY [B, M, K] f32 (aliased)
    edge_child_hbm,      # ANY [B, M, K] i32 (aliased)
    edge_n_hbm,          # ANY [B, M, K] i32 (aliased)
    edge_virt_hbm,       # ANY [B, M, K] i32 (aliased)
    edge_w_hbm,          # ANY [B, M, K] f32 (aliased)
    # outputs
    scal_out,            # SMEM (1, 4) i32
    expanded_out,        # (Mr, 128) i32
    root_n_out,          # (Ar, 128) i32
    root_virt_out,       # (Ar, 128) i32
    root_w_out,          # (Ar, 128) f32
    edge_action_out,     # ANY (alias)
    edge_prior_out,      # ANY (alias)
    edge_child_out,      # ANY (alias)
    edge_n_out,          # ANY (alias)
    edge_virt_out,       # ANY (alias)
    edge_w_out,          # ANY (alias)
    # scratch
    s_i, s_f, s_bn, s_bv, s_bw,   # (1, K) rows
    c_ea, c_ep, c_ec, c_en, c_ev, c_ew,   # (T, K) hot-row caches
    sems,                         # DMA semaphores (6,)
    *,
    V: int,
    K: int,
    Ar: int,
    T: int,
    ongoing: int,
):
    del (edge_action_hbm, edge_prior_hbm, edge_child_hbm, edge_n_hbm,
         edge_virt_hbm, edge_w_hbm)  # use aliased output refs
    g = pl.program_id(0)

    expanded_out[...] = expanded_in[...]
    root_n_out[...] = root_n_in[...]
    root_virt_out[...] = root_virt_in[...]
    root_w_out[...] = root_w_in[...]

    # load the hot top-of-tree into VMEM (one bulk DMA per array)
    _fetch_rows(sems, [
        (edge_action_out.at[g, pl.ds(0, T), :], c_ea),
        (edge_prior_out.at[g, pl.ds(0, T), :], c_ep),
        (edge_child_out.at[g, pl.ds(0, T), :], c_ec),
        (edge_n_out.at[g, pl.ds(0, T), :], c_en),
        (edge_virt_out.at[g, pl.ds(0, T), :], c_ev),
        (edge_w_out.at[g, pl.ds(0, T), :], c_ew),
    ])

    aidx = _flat_iota(Ar, LANES)

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

        # ---- expansion: write the leaf's 6 edge rows ---------------------
        was_expanded = _read_flat(expanded_out, cur) != 0
        do_expand = (res == ongoing) & (cur != 0) & ~was_expanded
        hot = cur < T
        ch = jnp.minimum(cur, T - 1)

        @pl.when(do_expand & hot)
        def _():
            va = topk_vals_ref[pl.ds(v, 1), :]
            ai = topk_aidx_ref[pl.ds(v, 1), :]
            okm = va >= 0.0
            c_ea[pl.ds(ch, 1), :] = jnp.where(okm, ai, NONE)
            c_ep[pl.ds(ch, 1), :] = jnp.where(okm, va, 0.0)
            c_en[pl.ds(ch, 1), :] = jnp.zeros((1, K), jnp.int32)
            c_ev[pl.ds(ch, 1), :] = jnp.zeros((1, K), jnp.int32)
            c_ew[pl.ds(ch, 1), :] = jnp.zeros((1, K), jnp.float32)
            c_ec[pl.ds(ch, 1), :] = jnp.full((1, K), NONE, jnp.int32)
            _write_flat(expanded_out, cur, 1)

        @pl.when(do_expand & ~hot)
        def _():
            va = topk_vals_ref[pl.ds(v, 1), :]
            ai = topk_aidx_ref[pl.ds(v, 1), :]
            okm = va >= 0.0
            row = lambda ref: ref.at[g, pl.ds(cur, 1), :]
            s_i[...] = jnp.where(okm, ai, NONE)
            pltpu.sync_copy(s_i, row(edge_action_out))
            s_f[...] = jnp.where(okm, va, 0.0)
            pltpu.sync_copy(s_f, row(edge_prior_out))
            s_i[...] = jnp.zeros((1, K), jnp.int32)
            pltpu.sync_copy(s_i, row(edge_n_out))
            pltpu.sync_copy(s_i, row(edge_virt_out))
            s_f[...] = jnp.zeros((1, K), jnp.float32)
            pltpu.sync_copy(s_f, row(edge_w_out))
            s_i[...] = jnp.full((1, K), NONE, jnp.int32)
            pltpu.sync_copy(s_i, row(edge_child_out))
            _write_flat(expanded_out, cur, 1)

        # ---- backup walk ------------------------------------------------
        def wcond(c):
            return c[0] != NONE

        def wbody(c):
            cur, sign, n0, virt0 = c
            p = _read_flat(parent_ref, cur)
            s = _read_flat(parent_slot_ref, cur)
            a = _read_flat(parent_action_ref, cur)
            is_root_edge = (p == 0) & (s == NONE)
            is_edge = (p != NONE) & ~is_root_edge
            at_root = cur == 0

            @pl.when(is_root_edge)
            def _():
                oh = aidx == a
                ohi = oh.astype(jnp.int32)
                root_n_out[...] = root_n_out[...] + ohi
                root_virt_out[...] = root_virt_out[...] - ohi
                root_w_out[...] = root_w_out[...] + jnp.where(
                    oh, sign * val, 0.0
                )

            p_hot = p < T
            pc = jnp.minimum(jnp.maximum(p, 0), T - 1)

            @pl.when(is_edge & p_hot)
            def _():
                oh = _lane_iota((1, K)) == s
                ohi = oh.astype(jnp.int32)
                c_en[pl.ds(pc, 1), :] = c_en[pl.ds(pc, 1), :] + ohi
                c_ev[pl.ds(pc, 1), :] = c_ev[pl.ds(pc, 1), :] - ohi
                c_ew[pl.ds(pc, 1), :] = c_ew[pl.ds(pc, 1), :] + jnp.where(
                    oh, sign * val, 0.0
                )

            @pl.when(is_edge & ~p_hot)
            def _():
                prow = lambda ref: ref.at[g, pl.ds(p, 1), :]
                _fetch_rows(sems, [
                    (prow(edge_n_out), s_bn),
                    (prow(edge_virt_out), s_bv),
                    (prow(edge_w_out), s_bw),
                ])
                oh = _lane_iota((1, K)) == s
                ohi = oh.astype(jnp.int32)
                s_bn[...] = s_bn[...] + ohi
                s_bv[...] = s_bv[...] - ohi
                s_bw[...] = s_bw[...] + jnp.where(oh, sign * val, 0.0)
                pltpu.sync_copy(s_bn, prow(edge_n_out))
                pltpu.sync_copy(s_bv, prow(edge_virt_out))
                pltpu.sync_copy(s_bw, prow(edge_w_out))

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
    # flush the hot rows back (expansions + backup stats)
    pltpu.sync_copy(c_ea, edge_action_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_ep, edge_prior_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_ec, edge_child_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_en, edge_n_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_ev, edge_virt_out.at[g, pl.ds(0, T), :])
    pltpu.sync_copy(c_ew, edge_w_out.at[g, pl.ds(0, T), :])
    scal_out[0, 0] = n0
    scal_out[0, 1] = virt0
    scal_out[0, 2] = 0
    scal_out[0, 3] = 0


def build_expand_backup_wave_hbm(engine, config, *, interpret: bool = False):
    """Drop-in for `build_expand_backup_wave` with the edge tier in HBM."""
    from ..types import ONGOING

    V = config.wave_size
    M = config.max_nodes
    K = config.max_children
    A = engine.num_actions
    Ar = _cdiv(A, LANES)
    Mr = _cdiv(M, LANES)
    T = min(M, CACHE_ROWS)

    kernel = partial(
        _expand_backup_kernel_hbm, V=V, K=K, Ar=Ar, T=T,
        ongoing=int(ONGOING),
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
    hbm = pl.BlockSpec(memory_space=pl.ANY)

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
        out_shapes = (
            jax.ShapeDtypeStruct((B, 1, 4), i32),         # scal
            jax.ShapeDtypeStruct((B, Mr, LANES), i32),    # expanded
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_n
            jax.ShapeDtypeStruct((B, Ar, LANES), i32),    # root_virt
            jax.ShapeDtypeStruct((B, Ar, LANES), f32),    # root_w
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_action
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_prior
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_child
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_n
            jax.ShapeDtypeStruct((B, M, K), i32),         # edge_virt
            jax.ShapeDtypeStruct((B, M, K), f32),         # edge_w
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                sspec, rowspec(V), rowspec(V), rowspec(V), rowspec(V),
                vspec(V, K), vspec(V, K),
                vspec(Mr, LANES), vspec(Mr, LANES), vspec(Mr, LANES),
                vspec(Mr, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                hbm, hbm, hbm, hbm, hbm, hbm,
            ],
            out_specs=(
                sspec,
                vspec(Mr, LANES),
                vspec(Ar, LANES), vspec(Ar, LANES), vspec(Ar, LANES),
                hbm, hbm, hbm, hbm, hbm, hbm,
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((1, K), i32), pltpu.VMEM((1, K), f32),
                pltpu.VMEM((1, K), i32), pltpu.VMEM((1, K), i32),
                pltpu.VMEM((1, K), f32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), f32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), i32),
                pltpu.VMEM((T, K), i32), pltpu.VMEM((T, K), f32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            input_output_aliases={14: 5, 15: 6, 16: 7, 17: 8, 18: 9, 19: 10},
            interpret=interpret,
        )(
            scal,
            leaves[:, None, :],
            values.astype(f32)[:, None, :],
            leaf_results[:, None, :],
            leaf_to_move.astype(i32)[:, None, :],
            topk_vals.astype(f32), topk_aidx,
            to_rows(tree.parent, padM, Mr),
            to_rows(tree.parent_slot, padM, Mr),
            to_rows(tree.parent_action, padM, Mr),
            to_rows(tree.expanded.astype(i32), padM, Mr),
            to_rows(tree.root_n, padA, Ar),
            to_rows(tree.root_virt, padA, Ar),
            to_rows(tree.root_w.astype(f32), padA, Ar),
            tree.edge_action, tree.edge_prior.astype(f32), tree.edge_child,
            tree.edge_n, tree.edge_virt, tree.edge_w.astype(f32),
        )
        (scal_o, exp_o, rn_o, rv_o, rw_o,
         ea_o, ep_o, ec_o, en_o, ev_o, ew_o) = outs

        def from_rows(x, n):
            return x.reshape(B, -1)[:, :n]

        return tree.replace(
            expanded=from_rows(exp_o, M).astype(bool),
            root_n=from_rows(rn_o, A),
            root_virt=from_rows(rv_o, A),
            root_w=from_rows(rw_o, A),
            edge_action=ea_o,
            edge_prior=ep_o,
            edge_child=ec_o,
            edge_n=en_o,
            edge_virt=ev_o,
            edge_w=ew_o,
            n0=scal_o[:, 0, 0],
            virt0=scal_o[:, 0, 1],
        )

    return run
