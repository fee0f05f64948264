"""Search-tree reuse: re-root onto a played move's subtree.

Equivalent of the reference's `Node::play` (alpha-tak/src/search/play.rs:
26-43): after a move is played, the chosen child's subtree — node states,
results, edge statistics, visit counts — carries over to the next search
instead of being rediscovered from scratch.

On-device formulation: mark nodes reachable from the new root (iterated
child-relation closure), compact them to the front of the node pool with
one permutation gather, remap parent/child links, and rebuild the dense
root tier from the new root's edge rows.  The new root's full-width prior
needs a fresh network evaluation (top-K edges only kept K priors); callers
get that for free from the `prepare_root` they already run per move — here
the root is left unexpanded with its statistics intact, and
`prepare_root_keep_stats` fills in the prior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tree import NONE, Tree


def blank_trees(tree: Tree, states, mask) -> Tree:
    """Reset masked games' trees in place to a fresh root at `states`.

    `tree` is batched ([B] leading axis), `states` a batched GameState,
    `mask` bool [B].  Used by callers that carry trees across moves but
    must drop oversized or stale subtrees (pool-headroom contract: a full
    pool backs up into n0 only, starving select_moves).
    """
    mrow = mask[:, None]

    def set0(arr, val):  # write slot 0 of a [B, M, ...] array
        upd = jnp.where(
            mask.reshape((-1,) + (1,) * (val.ndim - 1)), val, arr[:, 0]
        )
        return arr.at[:, 0].set(upd)

    state = jax.tree.map(set0, tree.state, states)
    zero_like = lambda a: jnp.where(
        mask.reshape((-1,) + (1,) * (a.ndim - 1)), jnp.zeros_like(a), a
    )
    return tree.replace(
        state=state,
        result=set0(tree.result, states.result),
        parent=tree.parent.at[:, 0].set(
            jnp.where(mask, NONE, tree.parent[:, 0])
        ),
        expanded=jnp.where(mrow, False, tree.expanded),
        node_n=zero_like(tree.node_n),
        node_virt=zero_like(tree.node_virt),
        child_count=zero_like(tree.child_count),
        root_prior=zero_like(tree.root_prior),
        root_legal=zero_like(tree.root_legal),
        root_n=zero_like(tree.root_n),
        root_virt=zero_like(tree.root_virt),
        root_w=zero_like(tree.root_w),
        root_child=jnp.where(mask[:, None], NONE, tree.root_child),
        n0=jnp.where(mask, 0, tree.n0),
        virt0=jnp.where(mask, 0, tree.virt0),
        next_free=jnp.where(mask, 1, tree.next_free),
    )


def _reach_doubling(tree: Tree, c0i, has_subtree):
    """Slots holding nodes in c0i's subtree, via parent-pointer doubling.

    ceil(log2(M)) fixed iterations instead of one iteration per tree
    LEVEL (the children-closure while_loop, kept below as
    `_reach_closure_reference` for the differential test): at 10k-sim
    depths the level-by-level walk costs hundreds of ms per reroot.

    Parent pointers of LIVE slots are always valid: eviction
    (search.py `_evict`) only picks childless victims, so a live node's
    parent — which has at least that child — can never have been
    evicted from under it.  Dead slots (evicted, not yet reused) keep a
    stale parent pointer, so ancestry alone over-approximates; they are
    masked off with a backlink check — a slot is live iff its parent's
    edge row (or the dense root tier) still points back at it, through
    an EXPANDED parent (recycled slots keep stale edge rows until the
    next expansion rewrites them)."""
    M = tree.result.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)

    # liveness: parent edge (or root tier) points back at the slot
    p = tree.parent
    pc = jnp.maximum(p, 0)
    s = tree.parent_slot
    a = tree.parent_action
    root_link = (p == 0) & (s == NONE) & (
        tree.root_child[jnp.clip(a, 0, tree.root_child.shape[0] - 1)] == idx
    )
    edge_link = (
        (s != NONE)
        & tree.expanded[pc]
        & (tree.edge_child[pc, jnp.maximum(s, 0)] == idx)
    )
    live = (p != NONE) & (root_link | edge_link)

    # ancestor-or-self chains via pointer doubling
    hit = (idx == c0i) & has_subtree
    jumpv = p
    for _ in range(max(1, (M - 1).bit_length())):
        jvalid = jumpv != NONE
        j = jnp.maximum(jumpv, 0)
        hit = hit | (jvalid & hit[j])
        jumpv = jnp.where(jvalid, jumpv[j], NONE)
    return hit & live


def _reach_closure_reference(tree: Tree, c0i, has_subtree):
    """Original level-by-level children closure (differential oracle for
    `_reach_doubling`; no longer on the reroot path)."""
    M = tree.result.shape[0]
    reach = jnp.zeros(M, bool).at[c0i].set(has_subtree)

    def cond(carry):
        reach, changed = carry
        return changed

    def body(carry):
        reach, _ = carry
        # unexpanded nodes' edge rows may be stale (recycled slots keep
        # their old rows until the next expansion rewrites them) — only
        # expanded rows carry live child pointers
        child_ok = (tree.edge_child != NONE) & tree.expanded[:, None]
        parent_reach = reach[:, None] & child_ok
        new = reach.at[
            jnp.where(parent_reach, tree.edge_child, M)
        ].set(True, mode="drop")
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(cond, body, (reach, has_subtree))
    return reach


def reroot(engine, tree: Tree, action, new_root_state, max_children: int,
           keep: int | None = None) -> Tree:
    """Single-game re-root of `tree` onto root action `action`.

    `new_root_state` is the played position (unbatched GameState); it is
    written to node 0 unconditionally, so if the action's child was never
    materialized the result degrades to a fresh tree at that position.
    `prepare_root` must still run afterwards (it re-evaluates the
    full-width root prior; the kept edges only stored K of them).

    `keep` (recycled pools): compact the carry to at most `keep` nodes
    by DROPPING the coldest childless carried nodes — the same loss
    class as in-search eviction (parent edges keep every backed-up
    visit/value; only the victims' cached states/priors go), applied at
    reroot time so sustained searches start with pool headroom instead
    of evicting from wave 1.  The drop iterates until the excess is
    gone (each pass creates newly-childless parents, so deep-chain
    carries need several passes) — the cap is exact except that the new
    root itself is never dropped.  Parents of dropped nodes get their
    edge_child pointer cleared by the compaction remap itself;
    child_count is recounted afterwards (in both keep and non-keep
    paths, so the invariant does not depend on `keep`).
    """
    M = tree.result.shape[0]
    A = tree.root_prior.shape[0]
    K = max_children

    c0 = tree.root_child[action]
    has_subtree = c0 != NONE
    c0i = jnp.maximum(c0, 0)
    reach = _reach_doubling(tree, c0i, has_subtree)

    if keep is not None:
        idx = jnp.arange(M, dtype=jnp.int32)
        INF = jnp.int32(2**30)
        ecl = jnp.maximum(tree.edge_child, 0)
        edge_ok = (tree.edge_child != NONE) & tree.expanded[:, None]

        def _excess(reach):
            return jnp.maximum(
                jnp.sum(reach.astype(jnp.int32)) - jnp.int32(keep), 0
            )

        def _cond(carry):
            reach, progressed = carry
            return (_excess(reach) > 0) & progressed

        def _drop_pass(carry):
            reach, _ = carry
            # live-children count restricted to the surviving carry:
            # dropping a node makes its parent a candidate next pass
            cc = jnp.sum(edge_ok & reach[ecl], axis=-1).astype(jnp.int32)
            cand = reach & (cc == 0) & (idx != c0i)
            score = jnp.where(cand, tree.node_n, INF)
            order = jnp.argsort(score, stable=True)  # ties -> lowest idx
            rank = jnp.zeros(M, jnp.int32).at[order].set(idx)
            new_reach = reach & ~(cand & (rank < _excess(reach)))
            return new_reach, jnp.any(new_reach != reach)

        reach, _ = jax.lax.while_loop(
            _cond, _drop_pass, (reach, jnp.bool_(True))
        )

    # --- compaction permutation: new_id = rank among reachable ----------
    ranks = jnp.cumsum(reach.astype(jnp.int32)) - 1
    new_id_of = jnp.where(reach, ranks, NONE)               # [M]
    # force the new root to index 0 by swapping with whoever ranks 0
    c0_rank = new_id_of[c0i]
    swap = lambda ids: jnp.where(
        ids == c0_rank, 0, jnp.where(ids == 0, c0_rank, ids)
    )
    new_id_of = jnp.where(reach, swap(new_id_of), NONE)
    n_reach = jnp.sum(reach.astype(jnp.int32))

    # gather order: old index that lands at each new slot
    old_of_new = jnp.full(M, 0, jnp.int32).at[
        jnp.where(reach, new_id_of, M)
    ].set(jnp.arange(M, dtype=jnp.int32), mode="drop")

    def remap_node_ref(arr):  # values that are node indices
        return jnp.where(arr == NONE, NONE, new_id_of[jnp.maximum(arr, 0)])

    def reorder(arr):  # leading M axis
        return arr[old_of_new]

    state = jax.tree.map(reorder, tree.state)
    # node 0 must hold the played position (degrades to a fresh tree when
    # the played action had no materialized child)
    state = jax.tree.map(
        lambda arr, leafv: arr.at[0].set(leafv), state, new_root_state
    )
    new_parent = remap_node_ref(reorder(tree.parent))
    new_parent_slot = reorder(tree.parent_slot)
    # children of the new root route their backups through the dense root
    # tier (walk dispatches on parent==0 & slot==NONE)
    new_parent_slot = jnp.where(new_parent == 0, NONE, new_parent_slot)
    valid_new = reach[old_of_new]  # new slot holds a carried node
    new_tree = tree.replace(
        state=state,
        result=reorder(tree.result).at[0].set(new_root_state.result),
        parent=new_parent,
        parent_slot=new_parent_slot,
        parent_action=reorder(tree.parent_action),
        expanded=reorder(tree.expanded) & valid_new,
        node_n=jnp.where(valid_new, reorder(tree.node_n), 0),
        node_virt=jnp.zeros_like(tree.node_virt),  # none in flight
        child_count=jnp.where(valid_new, reorder(tree.child_count), 0),
        edge_action=reorder(tree.edge_action),
        edge_prior=reorder(tree.edge_prior),
        edge_child=remap_node_ref(reorder(tree.edge_child)),
        edge_n=reorder(tree.edge_n),
        edge_virt=reorder(tree.edge_virt),
        edge_w=reorder(tree.edge_w),
        next_free=jnp.maximum(n_reach, 1),
    )

    # --- rebuild the dense root tier from the new root's edge row -------
    acts = new_tree.edge_action[0]                          # [K]
    valid = (acts != NONE) & has_subtree
    aidx = jnp.where(valid, acts, A)
    root_n = jnp.zeros(A, jnp.int32).at[aidx].set(
        new_tree.edge_n[0], mode="drop")
    root_w = jnp.zeros(A, jnp.float32).at[aidx].set(
        new_tree.edge_w[0], mode="drop")
    root_child = jnp.full(A, NONE, jnp.int32).at[aidx].set(
        new_tree.edge_child[0], mode="drop")
    # the old root tier held this child's totals at `action`
    n0 = jnp.where(has_subtree, tree.root_n[action], 0)

    # root node slot 0: clear its parent linkage and mark unexpanded so
    # prepare_root_keep_stats re-evaluates the full-width prior
    new_tree = new_tree.replace(
        parent=new_tree.parent.at[0].set(NONE),
        parent_slot=new_tree.parent_slot.at[0].set(NONE),
        parent_action=new_tree.parent_action.at[0].set(NONE),
        expanded=new_tree.expanded.at[0].set(False),
        node_n=new_tree.node_n.at[0].set(n0),
        root_prior=jnp.zeros(A, jnp.float32),
        root_legal=jnp.zeros(A, bool),
        root_n=root_n,
        root_virt=jnp.zeros(A, jnp.int32),
        root_w=root_w,
        root_child=root_child,
        n0=n0,
        virt0=jnp.int32(0),
    )

    # clear edge rows of node 0 beyond... they are the subtree's rows and
    # stay valid for continuation display; selection goes through the
    # dense root tier.
    #
    # Recount child_count from the remapped edge rows in BOTH paths:
    # with `keep`, dropped children were remapped to NONE above, so
    # newly-childless parents become eviction candidates; without it the
    # recount is an identity on live rows.  Only EXPANDED rows carry
    # live pointers (recycled slots keep stale rows until the next
    # expansion rewrites them), and node 0 is marked unexpanded above so
    # both paths agree on child_count[0] == 0.
    counts = jnp.sum(new_tree.edge_child != NONE, axis=-1).astype(jnp.int32)
    new_tree = new_tree.replace(
        child_count=jnp.where(new_tree.expanded, counts, 0)
    )
    return new_tree
