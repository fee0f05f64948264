"""Batched on-device MCTS with PUCT, virtual loss, and wave evaluation.

Search semantics follow `alpha-tak/src/search/mcts.rs` exactly where it
matters for play strength parity:

  * PUCT: U(s,a) = Q_vl(s,a) + C(s) * P(s,a) * sqrt(N(s)) / (1 + N(s,a))
    with C(N) = ln((1 + N + 500)/500) + 4 (mcts.rs:7-12,94-118) and
    Q_vl = (W - virt)/(N + virt), each virtual visit counted as a loss
    (node.rs:33-38).  Ties select the LAST maximum, matching Rust's
    `Iterator::max_by` (mcts.rs:105-111).
  * terminal nodes cache their result and back up concrete rewards of
    +/-1 (draw 0) anchored to the absolute winner (mcts.rs:53-64).
  * leaf evaluations back up the network value with alternating sign,
    starting with -value at the leaf (mcts.rs:67-91).

Execution model is TPU-native instead of thread-plus-channel
(player.rs:61-110), engineered for the hardware's actual cost model
(measured: scattered-element gathers and tiny kernels dominate; row reads,
dense elementwise math, and batched scatters are cheap):

  * stats live on edges / dense root arrays (see mcts/tree.py), so PUCT
    selection is row reads + vector math — no per-node stat gathers;
  * each cursor carries its own node's visit count (read off the edge it
    traversed), so selection needs no parent lookups at all;
  * all `wave_size` descents advance one tree level per iteration with
    staggered starts (cursor v starts at iteration v).  Cursors always
    sit at distinct depths, so earlier descents have already virtually
    visited everything a later cursor sees — bitwise-identical to running
    the descents sequentially — while every tree operation batches
    across cursors;
  * descents walk indices only: the env step for every new leaf, the
    network evaluation, node expansion, and all V backups happen batched
    once per wave; the whole search for a move is one jitted
    `lax.scan` over waves.

Known deviation from the reference (documented): a node created earlier in
the same wave is "pending" (its NN prior hasn't arrived).  The reference
descends through such nodes using uniform temporary priors
(mcts.rs:42-47); here the descent stops at the pending node and reuses the
evaluation already in flight.  With the reference's own self-play
configuration (one descent per game per wave, self_play.rs:181-210) the
behaviors coincide.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp

from ..engine.core import Engine
from ..types import ONGOING, GameState, result_winner
from .tree import NONE, Tree, init_tree

EXPLORATION_BASE = 500.0
EXPLORATION_INIT = 4.0


@dataclass(frozen=True)
class SearchConfig:
    num_sims: int = 10_000      # rollouts per move (self_play.rs:12)
    wave_size: int = 8          # descents per game between NN evals
    max_children: int = 128     # K: stored edges per non-root node (lane-aligned: the HBM tier requires K % 128 == 0)
    node_budget: int | None = None  # tree capacity; default fits num_sims
    exploration_base: float = EXPLORATION_BASE
    exploration_init: float = EXPLORATION_INIT
    # descent backend: "auto" = fused Pallas kernel on TPU when the tree
    # fits in VMEM, XLA otherwise; "xla" / "pallas" force; "pallas" on a
    # CPU host runs the kernel in interpreter mode (tests).
    backend: str = "auto"
    # top-K child selection: "exact" | "packed" | "packedq" (see
    # masked_topk).  "auto" = packedq on TPU (+9.4% search throughput at
    # the bench config: one int32 top_k over quantized-prior||action keys,
    # priors decoded from the keys with < 2^-17 error), exact on CPU
    # (keeps the CPU reference path bit-exact for the parity suites).
    topk_impl: str = "auto"
    # fold the leaf legal mask into the fused step kernel (packed words +
    # fused masked top-k) instead of a separate XLA legal_mask pass.
    # Measured 9% SLOWER end-to-end on this backend (docs/ROADMAP.md dead
    # ends: the padded-row relayouts cost more than XLA's legal_mask);
    # kept available for re-evaluation on other hardware.
    fused_leaf_legal: bool = False
    # node recycling: when the pool is full, a create evicts the
    # coldest unpinned CHILDLESS node (min node_n; never the root, an
    # in-flight leaf, or a node with materialized children) instead of
    # degrading to a parent re-eval.  Because statistics are
    # edge-resident, eviction loses NO backed-up visits/values — only the
    # victim's cached state and priors (one extra eval if revisited), and
    # min-visit ordering peels cold subtrees bottom-up.  This lets a
    # bounded VMEM-tier pool (node_budget ~1-1.5k) serve arbitrarily deep
    # sim budgets (the reference's 10k rollouts/move, self_play.rs:12)
    # at fused-kernel speed instead of the HBM tier's per-row-DMA pace.
    # Set node_budget explicitly when enabling.  Not available on the
    # pallas_hbm backend.
    recycle: bool = False
    # reroot-time carry compaction (recycled pools): keep at most this
    # many carried nodes when re-rooting between moves, dropping the
    # coldest childless ones (lossless for backed-up edge statistics —
    # see mcts/reuse.reroot).  None = carry everything reachable.
    # Sustained deep searches otherwise start each move with a FULL
    # pool and evict from wave 1.
    reroot_keep: int | None = None
    # run the wave scan in chunks of ~this many sims per jitted call
    # (rounded up to whole waves), looping on the persistent tree until
    # num_sims is reached.  Bit-identical to one long scan (the chunk
    # boundary's pending-flush is the same op the merged kernel would
    # run), but compile time no longer grows with num_sims — on this
    # backend a 625-wave scan program fails to compile inside 15 min
    # while the 32-wave chunk program compiles once and serves any sim
    # budget.  Dispatch overhead is hidden by queue pipelining.
    # None = single scan (default; the bench-size configs).
    scan_chunk: int | None = None
    # Gumbel root selection (Danihelka et al. 2022, "Policy improvement by
    # planning with Gumbel"): 0 = off (reference PUCT parity).  When > 0,
    # root descents follow a sequential-halving schedule over the top
    # `gumbel_m` actions scored by g + log pi + sigma(q); use
    # run_sims_gumbel / select_moves_gumbel.  Non-root selection stays
    # PUCT.  XLA descent backend only (off the fused Pallas path).
    gumbel_m: int = 0
    gumbel_c_visit: float = 50.0
    gumbel_c_scale: float = 1.0

    @property
    def num_waves(self) -> int:
        return -(-self.num_sims // self.wave_size)

    @property
    def max_nodes(self) -> int:
        """Node pool size.  Set `node_budget` when calling run_sims more
        than once on the same tree (pondering / incremental thinking)."""
        return self.node_budget or (self.num_waves * self.wave_size + 2)


def _argmax_last(x):
    """Index of the maximum; ties broken toward the LAST index (Rust max_by)."""
    return x.shape[-1] - 1 - jnp.argmax(x[::-1])


def masked_topk(policy, legal, k, impl="exact"):
    """(vals, action_ids) of the top-k legal policy entries per row.

    `policy` must be a softmax (entries in [0, 1]).  impl="exact" is
    `top_k(where(legal, policy, -1), k)`.  impl="packed"/"packedq" pack a
    quantized prior and the action id into ONE int32 key and run a
    single integer top_k — measured 2.3x faster than the f32
    value+index top_k on this backend ([16k, 9036] K=32: 7.7ms vs
    17.5ms).  "packed" then gathers the EXACT f32 priors by index, but
    the [R, K] gather eats the win inside the full wave program (136.8k
    vs 139.2k sims/s end-to-end); "packedq" decodes the quantized priors
    straight from the keys (+9.4% end-to-end: 152.3k vs 139.2k).
    Deviations from "exact": which action wins a sub-quantum prior tie
    (< 2^-17 for 6x6) at the K boundary, and (packedq) priors carry
    < 2^-17 absolute error into the PUCT U-term; both fall inside the
    existing top-K truncation envelope (the reference stores ALL
    children, node.rs:4-11).  Pad slots return vals=-1, aidx=0.
    """
    if impl == "exact":
        masked = jnp.where(legal, policy, -1.0)
        return jax.lax.top_k(masked, k)
    if impl not in ("packed", "packedq"):
        raise ValueError(f"unknown topk impl {impl!r}")
    decode_vals = impl == "packedq"
    A = policy.shape[-1]
    idx_bits = max(1, (A - 1).bit_length())
    q_bits = min(17, 31 - idx_bits)
    if q_bits < 8:
        raise ValueError(f"action space {A} too wide for packed topk")
    scale = float((1 << q_bits) - 1)
    q = jnp.round(policy * scale).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, policy.shape, policy.ndim - 1)
    key = jnp.where(legal, (q << idx_bits) | iota, jnp.int32(-(1 << 31)))
    top, _ = jax.lax.top_k(key, k)
    ok = top >= 0  # legal keys are always >= 0 (q, iota >= 0)
    aidx = jnp.where(ok, top & ((1 << idx_bits) - 1), 0)
    if decode_vals:
        # quantized priors straight from the keys (err < 1/scale); skips
        # the [R, K] gather of exact values
        vals = (top >> idx_bits).astype(jnp.float32) / scale
    else:
        vals = jnp.take_along_axis(policy, aidx, axis=-1)
    return jnp.where(ok, vals, -1.0), aidx.astype(jnp.int32)


class MCTS:
    """Batched search bound to an engine and an evaluation function.

    eval_fn(params, states_with_leading_batch) -> (policy [*, A], value [*])
    where policy is a softmax over the full action space (net6.rs:98-108).
    `prepare_root` must run on fresh trees before `run_sims`.
    """

    def __init__(self, engine: Engine, eval_fn, config: SearchConfig):
        self.engine = engine
        self.eval_fn = eval_fn
        self.config = config
        self._resolve_backend()

    def _resolve_backend(self):
        """Pick the fused Pallas descent/expand+backup kernels or XLA paths.

        Three tiers: "pallas" = whole-tree-in-VMEM kernels (pallas_ops,
        caps the node pool at ~1.5k — bench-size searches); "pallas_hbm"
        = edge tier stays in HBM with per-row DMA (pallas_hbm, any pool
        up to MAX_HBM_NODES — self-play's 10k rollouts, Player ponder
        trees); "xla" = the vmapped lax.while_loop reference path.
        "auto" picks vmem > hbm > xla on TPU, xla on CPU.
        """
        from .pallas_hbm import (
            build_descend_wave_hbm, build_expand_backup_wave_hbm, fits_hbm,
        )
        from .pallas_ops import (
            build_descend_wave, build_expand_backup_wave, fits_in_vmem,
        )

        cfg = self.config
        if cfg.backend not in ("auto", "xla", "pallas", "pallas_hbm"):
            raise ValueError(f"unknown search backend {cfg.backend!r}")
        if cfg.gumbel_m > 0 and cfg.backend.startswith("pallas"):
            raise ValueError(
                "gumbel root selection runs on the XLA descent backend only"
            )
        if cfg.recycle and cfg.backend == "pallas_hbm":
            raise ValueError(
                "node recycling runs on the VMEM pallas tier or the XLA "
                "path; the HBM tier's per-row DMA layout does not support it"
            )
        on_tpu = jax.default_backend() not in ("cpu",)
        if cfg.topk_impl == "auto":
            self._topk_impl = "packedq" if on_tpu else "exact"
        elif cfg.topk_impl in ("exact", "packed", "packedq"):
            self._topk_impl = cfg.topk_impl
        else:
            raise ValueError(f"unknown topk_impl {cfg.topk_impl!r}")
        self._backup_descend = None
        if cfg.gumbel_m > 0:
            self._use_pallas = False
            self._pallas_kind = None
            self._descend = lambda tree_b: jax.vmap(self._descend_wave)(tree_b)
            self._fused_leaf_step = None
            self._leaf_step_emits_legal = False
            return
        kind = None
        if cfg.backend == "pallas":
            kind = "vmem"
        elif cfg.backend == "pallas_hbm":
            if on_tpu and cfg.max_children % 128 != 0:
                raise ValueError(
                    "pallas_hbm requires max_children % 128 == 0 on TPU "
                    "(HBM row slices must be lane-aligned)"
                )
            kind = "hbm"
        elif cfg.backend == "auto" and on_tpu:
            if fits_in_vmem(cfg.max_nodes, cfg.max_children,
                            self.engine.num_actions):
                kind = "vmem"
            elif not cfg.recycle and fits_hbm(cfg.max_nodes, cfg.max_children):
                kind = "hbm"
        self._pallas_kind = kind
        self._use_pallas = kind is not None
        if kind == "vmem":
            from .pallas_ops import build_backup_descend_wave

            self._descend = build_descend_wave(
                self.engine, cfg, interpret=not on_tpu
            )
            self._expand_backup = build_expand_backup_wave(
                self.engine, cfg, interpret=not on_tpu
            )
            # merged kernel for the pipelined scan (one tree DMA round
            # per wave instead of two; bit-identical semantics)
            self._backup_descend = build_backup_descend_wave(
                self.engine, cfg, interpret=not on_tpu
            )
        elif kind == "hbm":
            self._descend = build_descend_wave_hbm(
                self.engine, cfg, interpret=not on_tpu
            )
            self._expand_backup = build_expand_backup_wave_hbm(
                self.engine, cfg, interpret=not on_tpu
            )
        else:
            self._descend = lambda tree_b: jax.vmap(self._descend_wave)(tree_b)
        # fused leaf step: one Pallas kernel for step+result+legality of
        # the whole wave's leaves (engine/pallas_env.py), replacing ~50
        # XLA kernels AND the separate XLA legal_mask pass
        self._fused_leaf_step = None
        self._leaf_step_emits_legal = False
        if self._use_pallas and self.engine.fused_kernels_supported:
            if cfg.fused_leaf_legal:
                self._fused_leaf_step = self.engine.fused_step_legal_fn(
                    block_g=128, interpret=not on_tpu
                )
                self._leaf_step_emits_legal = True
            else:
                self._fused_leaf_step = self.engine.fused_step_fn(
                    block_g=128, interpret=not on_tpu
                )

    # -- tree construction -------------------------------------------------

    def init_batch(self, root_states: GameState) -> Tree:
        """Fresh trees for a batch of root states (leading axis B)."""
        return jax.vmap(
            lambda s: init_tree(
                self.engine, s, self.config.max_nodes, self.config.max_children
            )
        )(root_states)

    # -- selection ---------------------------------------------------------

    def _c_puct(self, n):
        cfg = self.config
        return (
            jnp.log((1.0 + n + cfg.exploration_base) / cfg.exploration_base)
            + cfg.exploration_init
        )

    @staticmethod
    def _q_vl(n, virt, w):
        tot = (n + virt).astype(jnp.float32)
        q = jnp.where(
            tot > 0, (w - virt.astype(jnp.float32)) / jnp.maximum(tot, 1.0), 0.0
        )
        return q, tot

    def _select_root(self, tree: Tree):
        """Dense PUCT over the full action space (no gathers)."""
        n0 = (tree.n0 + tree.virt0).astype(jnp.float32)
        q, tot = self._q_vl(tree.root_n, tree.root_virt, tree.root_w)
        u = self._c_puct(n0) * tree.root_prior * jnp.sqrt(n0) / (1.0 + tot)
        scores = jnp.where(tree.root_legal, q + u, -jnp.inf)
        return _argmax_last(scores)

    # -- gumbel root selection (sequential halving) --------------------------

    @cached_property
    def _considered_seq(self):
        """Scheduled visit count for each root-descent index: sequential
        halving over `gumbel_m` actions across the whole sim budget."""
        import numpy as np

        cfg = self.config
        n = cfg.num_waves * cfg.wave_size
        m = max(2, min(cfg.gumbel_m, self.engine.num_actions))
        import math

        phases = max(1, math.ceil(math.log2(m)))
        seq: list[int] = []
        visits = 0
        considered = m
        while len(seq) < n:
            extra = max(1, n // (phases * considered))
            for _ in range(extra):
                seq.extend([visits] * considered)
                visits += 1
                if len(seq) >= n:
                    break
            considered = max(2, considered // 2)
        return jnp.asarray(np.asarray(seq[:n], np.int32))

    def _gumbel_scores(self, tree: Tree, gumbel):
        """g + log(prior) + sigma(completed q) over the root actions ([A]).

        sigma(q) = (c_visit + max_a N(a)) * c_scale * q; unvisited actions
        complete q with the visit-weighted root value estimate.
        """
        cfg = self.config
        n = tree.root_n.astype(jnp.float32)
        visited = tree.root_n > 0
        q = jnp.where(visited, tree.root_w / jnp.maximum(n, 1.0), 0.0)
        total_n = jnp.sum(n)
        v_mix = jnp.where(
            total_n > 0, jnp.sum(tree.root_w) / jnp.maximum(total_n, 1.0), 0.0
        )
        qc = jnp.where(visited, q, v_mix)
        maxn = jnp.max(tree.root_n).astype(jnp.float32)
        sigma = (cfg.gumbel_c_visit + maxn) * cfg.gumbel_c_scale
        logp = jnp.log(jnp.maximum(tree.root_prior, 1e-30))
        scores = gumbel + logp + sigma * qc
        return jnp.where(tree.root_legal, scores, -jnp.inf)

    def _select_root_gumbel(self, tree: Tree, gumbel, sim_idx):
        """Root action for descent `sim_idx`: among actions whose current
        visit count matches the halving schedule, take the best score;
        fall back to least-visited-best-scored if none matches (possible
        when terminal shortcuts desync the schedule)."""
        seq = self._considered_seq
        target = seq[jnp.minimum(sim_idx, seq.shape[0] - 1)]
        nvis = tree.root_n + tree.root_virt          # in-flight counts too
        scores = self._gumbel_scores(tree, gumbel)
        on_schedule = tree.root_legal & (nvis == target)
        sel = jnp.where(on_schedule, scores, -jnp.inf)
        fallback = scores - 1e7 * nvis.astype(jnp.float32)
        use = jnp.where(jnp.any(on_schedule), sel, fallback)
        return _argmax_last(use)

    # -- node recycling (config.recycle) ------------------------------------

    def _pick_victims(self, tree: Tree, protect_idx, k: int):
        """Top-k eviction candidates by ascending node_n ([k] ids, [k]
        valid).  Candidates are childless, unpinned, non-root, and not in
        `protect_idx` (node ids; M entries ignored).  Ties break toward
        the LOWEST node index (matches the kernels' sequential argmin).

        node_n is the parent-edge visit count SNAPSHOT at materialization
        (not maintained by backups): a childless non-terminal node can
        outgrow its snapshot by at most one visit before it gains a child
        and leaves the candidate set, and re-evicting a hot terminal only
        costs one env re-step — so the frozen score ranks real candidates
        the same while keeping backups maintenance-free."""
        M = self.config.max_nodes
        protect = jnp.zeros(M + 1, bool).at[
            jnp.clip(protect_idx, 0, M)
        ].set(True)
        cand = (
            (tree.child_count == 0)
            & (tree.node_virt == 0)
            & (jnp.arange(M) > 0)
            & ~protect[:M]
        )
        INF = jnp.int32(2**30)
        score = jnp.where(cand, tree.node_n, INF)
        neg_vals, victims = jax.lax.top_k(-score, k)
        return victims.astype(jnp.int32), neg_vals > -INF

    def _evict(self, tree: Tree, vid):
        """Detach victim slots `vid` ([k] ids; M = unused) from their
        parents and reset them to unallocated leaves.  The parent edge's
        statistics (N, W, prior) are kept — selection still sees the
        aggregate; the subtree re-materializes on demand."""
        M = self.config.max_nodes
        A = self.engine.num_actions
        vidc = jnp.clip(vid, 0, M - 1)
        used = vid < M
        pv = jnp.where(used, tree.parent[vidc], M)
        sv = tree.parent_slot[vidc]
        av = jnp.where(used, tree.parent_action[vidc], A)
        is_root_edge = used & (pv == 0) & (sv == NONE)
        is_edge = used & ~is_root_edge
        return tree.replace(
            edge_child=tree.edge_child.at[
                jnp.where(is_edge, pv, M), sv
            ].set(NONE, mode="drop"),
            root_child=tree.root_child.at[
                jnp.where(is_root_edge, av, A)
            ].set(NONE, mode="drop"),
            child_count=tree.child_count.at[
                jnp.where(used, pv, M)
            ].add(-1, mode="drop"),
            expanded=tree.expanded.at[vid].set(False, mode="drop"),
            node_n=tree.node_n.at[vid].set(0, mode="drop"),
        )

    def _select_edges(self, tree: Tree, cur, nv):
        """PUCT over the K edge rows of `cur` ([V]); nv = carried N(cur)."""
        ci = jnp.maximum(cur, 0)
        acts = tree.edge_action[ci]                     # [V, K] row reads
        q, tot = self._q_vl(tree.edge_n[ci], tree.edge_virt[ci], tree.edge_w[ci])
        npf = nv.astype(jnp.float32)[:, None]
        u = self._c_puct(npf) * tree.edge_prior[ci] * jnp.sqrt(npf) / (1.0 + tot)
        scores = jnp.where(acts != NONE, q + u, -jnp.inf)
        K = scores.shape[-1]
        slots = K - 1 - jnp.argmax(scores[:, ::-1], axis=-1)
        return slots

    # -- pipelined wave descents -------------------------------------------

    def _descend_wave(self, tree: Tree, gumbel=None, sim_offset=None):
        """Run wave_size pipelined descents on one game's tree.

        With `gumbel`/`sim_offset` set, root selection follows the
        sequential-halving schedule (descent t uses sim index
        sim_offset + t); non-root selection stays PUCT.
        Returns (tree, leaf [V], created [V]).
        """
        V = self.config.wave_size
        M = self.config.max_nodes
        A = self.engine.num_actions
        NONE_V = jnp.full(V, NONE, jnp.int32)
        iota = jnp.arange(V)
        rc = self.config.recycle

        def cond(carry):
            t, _tree, cur, _nv, _leaf, _created = carry
            return (t < V) | jnp.any(cur != NONE)

        def body(carry):
            t, tree, cur, nv, leaf, created = carry

            # --- start cursor t at the root ----------------------------
            starting = t < V
            if gumbel is None:
                a0 = self._select_root(tree)
            else:
                a0 = self._select_root_gumbel(tree, gumbel, sim_offset + t)
            c0 = tree.root_child[a0]
            nv0 = tree.root_n[a0] + tree.root_virt[a0]  # pre-mark count
            want0 = starting & (c0 == NONE)
            fresh0 = tree.next_free < M
            if rc:
                # allocation: fresh slot, else evict the coldest candidate
                # (never a node a cursor sits on — in-flight leaves are
                # node_virt-pinned, path nodes have children, active
                # cursors' positions are protected explicitly)
                victims1, valid1 = self._pick_victims(
                    tree, jnp.where(cur != NONE, cur, M), 1
                )
                use_v0 = want0 & ~fresh0
                ok0 = want0 & (fresh0 | valid1[0])
                idx0 = jnp.where(use_v0, victims1[0], tree.next_free)
                tree = self._evict(
                    tree, jnp.where(use_v0 & ok0, victims1, M)
                )
            else:
                ok0 = want0 & fresh0
                use_v0 = jnp.zeros((), bool)
                idx0 = tree.next_free
            # mark the root edge's virtual loss only when the descent can
            # proceed: a failed create degrades to a root re-eval whose
            # backup never reaches this edge, so an unconditional mark
            # would LEAK a virtual visit per descent
            proceed0 = (c0 != NONE) | ok0
            mark0 = jnp.where(starting & proceed0, a0, A)
            root_virt = tree.root_virt.at[mark0].add(1, mode="drop")
            virt0 = tree.virt0 + jnp.where(starting, 1, 0)
            root_child = tree.root_child.at[
                jnp.where(ok0, a0, A)
            ].set(idx0, mode="drop")
            sent0 = jnp.where(ok0, idx0, M)
            parent = tree.parent.at[sent0].set(0, mode="drop")
            parent_slot = tree.parent_slot.at[sent0].set(NONE, mode="drop")
            parent_action = tree.parent_action.at[sent0].set(a0, mode="drop")
            next_free = tree.next_free + jnp.where(ok0 & ~use_v0, 1, 0)
            is_t = iota == t
            cur = jnp.where(is_t & starting & ~ok0, c0, cur)
            nv = jnp.where(is_t, nv0, nv)
            leaf = jnp.where(is_t & ok0, idx0, leaf)
            created = created | (is_t & ok0)
            tree = tree.replace(
                root_virt=root_virt, virt0=virt0, root_child=root_child,
                parent=parent, parent_slot=parent_slot,
                parent_action=parent_action, next_free=next_free,
            )
            if rc:
                # bookkeeping + pin cursors that resolved in this section
                # (created leaf, or failed create -> root re-eval)
                pin0 = jnp.where(
                    starting & ok0, idx0,
                    jnp.where(starting & want0 & ~ok0, 0, M),
                )
                tree = tree.replace(
                    child_count=tree.child_count.at[
                        jnp.where(ok0, 0, M)
                    ].add(1, mode="drop"),
                    node_n=tree.node_n.at[sent0].set(
                        tree.root_n[a0], mode="drop"
                    ),
                    node_virt=tree.node_virt.at[pin0].add(1, mode="drop"),
                )

            # --- advance every active cursor one level -----------------
            active = cur != NONE
            ci = jnp.maximum(cur, 0)
            stop_here = active & ~tree.expanded[ci]
            walking = active & ~stop_here
            slots = self._select_edges(tree, cur, nv)
            action = tree.edge_action[ci, slots]
            child = tree.edge_child[ci, slots]
            child_en = tree.edge_n[ci, slots]
            child_nv = child_en + tree.edge_virt[ci, slots]
            # mark the traversed edge's virtual loss (node.rs:33-38)
            mrow = jnp.where(walking, ci, M)
            edge_virt = tree.edge_virt.at[mrow, slots].add(1, mode="drop")

            want_create = walking & (child == NONE)
            ranks = jnp.cumsum(want_create.astype(jnp.int32)) - 1
            if rc:
                # protect nodes cursors sit on or are moving into; then
                # fresh slots first, victims for the overflow
                prot = jnp.concatenate([
                    jnp.where(active, ci, M),
                    jnp.where(walking & (child != NONE), child, M),
                ])
                victims, vvalid = self._pick_victims(tree, prot, V)
                avail = M - tree.next_free
                vrank = ranks - avail
                use_v = want_create & (vrank >= 0)
                vsel = jnp.clip(vrank, 0, V - 1)
                ok_create = want_create & jnp.where(
                    use_v, vvalid[vsel], True
                )
                ids = jnp.where(use_v, victims[vsel], tree.next_free + ranks)
                tree = self._evict(tree, jnp.where(use_v & ok_create, ids, M))
            else:
                ids = tree.next_free + ranks
                ok_create = want_create & (ids < M)
                use_v = jnp.zeros(V, bool)
            idxv = jnp.where(ok_create, ids, M)
            edge_child = tree.edge_child.at[
                jnp.where(ok_create, ci, M), slots
            ].set(idxv, mode="drop")
            parent = tree.parent.at[idxv].set(cur, mode="drop")
            parent_slot = tree.parent_slot.at[idxv].set(slots, mode="drop")
            parent_action = tree.parent_action.at[idxv].set(action, mode="drop")
            next_free = tree.next_free + jnp.sum(ok_create & ~use_v)
            tree = tree.replace(
                edge_virt=edge_virt, edge_child=edge_child, parent=parent,
                parent_slot=parent_slot, parent_action=parent_action,
                next_free=next_free,
            )

            # resolve cursors: stop at pending/terminal nodes, stop on
            # fresh creations, re-eval the parent when the pool is full
            stopping = stop_here | want_create
            new_leaf = jnp.where(
                stop_here, cur, jnp.where(ok_create, idxv, cur)
            )
            if rc:
                tree = tree.replace(
                    child_count=tree.child_count.at[
                        jnp.where(ok_create, ci, M)
                    ].add(1, mode="drop"),
                    node_n=tree.node_n.at[idxv].set(child_en, mode="drop"),
                    node_virt=tree.node_virt.at[
                        jnp.where(stopping & active, new_leaf, M)
                    ].add(1, mode="drop"),
                )
            leaf = jnp.where(stopping & active, new_leaf, leaf)
            created = created | ok_create
            cur = jnp.where(stopping | ~active, NONE_V, child)
            nv = jnp.where(stopping | ~active, nv, child_nv)
            return (t + 1, tree, cur, nv, leaf, created)

        init = (jnp.int32(0), tree, NONE_V, jnp.zeros(V, jnp.int32),
                NONE_V, jnp.zeros(V, bool))
        _, tree, _, _, leaf, created = jax.lax.while_loop(cond, body, init)
        leaf = jnp.maximum(leaf, 0)  # unresolved (pathological) -> root
        return tree, leaf, created

    # -- wave-end evaluation application -----------------------------------

    def _write_nodes(self, tree: Tree, leaves, created, leaf_states,
                     leaf_results):
        """Write created nodes' states + results (unique indices)."""
        M = self.config.max_nodes
        idx = jnp.where(created, leaves, M)
        state = jax.tree.map(
            lambda arr, upd: arr.at[idx].set(upd, mode="drop"),
            tree.state, leaf_states,
        )
        result = tree.result.at[idx].set(leaf_results, mode="drop")
        return tree.replace(state=state, result=result)

    def _write_and_expand(self, tree: Tree, leaves, created, leaf_states,
                          leaf_results, policy):
        """Write created nodes' states/results and expand new leaves.

        leaves/created: [V]; leaf_states: GameState with leading [V];
        policy [V, A].
        """
        V = leaves.shape[0]
        M = self.config.max_nodes

        tree = self._write_nodes(tree, leaves, created, leaf_states,
                                 leaf_results)
        terminal = tree.result[leaves] != ONGOING

        # -- expansion, fully batched: every non-terminal non-root leaf
        # row gets its top-K legal priors (duplicate pending leaves write
        # identical rows; the root is expanded by prepare_root) ----------
        legal_masks = jax.vmap(self.engine.legal_mask)(leaf_states)
        vals, aidx = masked_topk(                              # [V, K]
            policy, legal_masks, self.config.max_children, self._topk_impl
        )
        ok = vals >= 0.0
        # never rewrite an already-expanded node (pool-full fallback leaves)
        rows = jnp.where(
            terminal | (leaves == 0) | tree.expanded[leaves], M, leaves
        )
        zero_i = jnp.zeros((V, self.config.max_children), jnp.int32)
        zero_f = jnp.zeros((V, self.config.max_children), jnp.float32)
        tree = tree.replace(
            edge_action=tree.edge_action.at[rows].set(
                jnp.where(ok, aidx, NONE), mode="drop"
            ),
            edge_prior=tree.edge_prior.at[rows].set(
                jnp.where(ok, vals, 0.0), mode="drop"
            ),
            # clear stats rows: node slots may be recycled by re-rooting
            edge_n=tree.edge_n.at[rows].set(zero_i, mode="drop"),
            edge_virt=tree.edge_virt.at[rows].set(zero_i, mode="drop"),
            edge_w=tree.edge_w.at[rows].set(zero_f, mode="drop"),
            edge_child=tree.edge_child.at[rows].set(
                jnp.full_like(zero_i, NONE), mode="drop"
            ),
            expanded=tree.expanded.at[rows].set(True, mode="drop"),
        )
        return tree

    def _leaf_values(self, tree: Tree, leaves, leaf_states, value):
        """Backup values per leaf: terminal leaves use the anchored game
        outcome instead of the network eval (mcts.rs:53-64)."""
        res = tree.result[leaves]
        terminal = res != ONGOING
        winner = result_winner(res)
        term_val = jnp.where(
            winner < 0, 0.0,
            jnp.where(leaf_states.to_move == winner, 1.0, -1.0),
        )
        return jnp.where(terminal, term_val, value)

    def _backup_xla(self, tree: Tree, leaves, values):
        """All V backups walk up in lockstep (mcts.rs:67-91 signs)."""
        M = self.config.max_nodes
        A = self.engine.num_actions
        V = leaves.shape[0]
        rc = self.config.recycle

        if rc:
            # release the descent's in-flight pin (one per backup entry)
            tree = tree.replace(
                node_virt=tree.node_virt.at[leaves].add(-1, mode="drop")
            )

        def walk_cond(carry):
            cur, _sign, _t = carry
            return jnp.any(cur != NONE)

        def walk_body(carry):
            cur, sign, t = carry
            alive = cur != NONE
            ci = jnp.maximum(cur, 0)
            p = t.parent[ci]
            s = t.parent_slot[ci]
            a = t.parent_action[ci]
            # edge entry: parent's slot row, or the dense root arrays
            is_root_edge = alive & (p == 0) & (s == NONE)
            is_edge = alive & (p != NONE) & ~is_root_edge
            ridx = jnp.where(is_root_edge, a, A)
            erow = jnp.where(is_edge, p, M)
            at_root = alive & (cur == 0)
            t = t.replace(
                root_n=t.root_n.at[ridx].add(1, mode="drop"),
                root_virt=t.root_virt.at[ridx].add(-1, mode="drop"),
                root_w=t.root_w.at[ridx].add(sign * values, mode="drop"),
                edge_n=t.edge_n.at[erow, s].add(1, mode="drop"),
                edge_virt=t.edge_virt.at[erow, s].add(-1, mode="drop"),
                edge_w=t.edge_w.at[erow, s].add(sign * values, mode="drop"),
                n0=t.n0 + jnp.sum(at_root),
                virt0=t.virt0 - jnp.sum(at_root),
            )
            cur = jnp.where(alive, p, NONE)
            return (cur, -sign, t)

        _, _, tree = jax.lax.while_loop(
            walk_cond, walk_body, (leaves, jnp.full(V, -1.0), tree)
        )
        return tree

    # -- waves --------------------------------------------------------------

    def _leaf_states_of(self, tree_b: Tree, leaves):
        """Recompute every leaf's state with one batched env step:
        leaf = step(state[parent], parent_action); root leaf = root state.
        Returns (leaf_states [B, V, ...], fused_legal-or-None)."""
        engine = self.engine
        B, V_ = leaves.shape
        fused_legal = None  # (place, spread) packed words when available
        if self._fused_leaf_step is not None and (B * V_) % 128 == 0:
            # gather parent states / actions (XLA), then one fused kernel
            def gather_parents(tree, ls):
                # root leaves (ls == 0) gather the root itself, regardless
                # of what parent[0] holds after re-rooting
                p = jnp.where(ls == 0, 0, jnp.maximum(tree.parent[ls], 0))
                parents = jax.tree.map(lambda x: x[p], tree.state)
                acts = jnp.maximum(tree.parent_action[ls], 0)
                return parents, acts

            parents, acts = jax.vmap(gather_parents)(tree_b, leaves)
            flat_parents = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), parents
            )
            # a root leaf (index 0) re-evaluates the root: disabled games
            # come back frozen = the gathered root state itself
            enabled = (leaves != 0).reshape(-1)
            if self._leaf_step_emits_legal:
                flat_leaf_states, pl_pk, sw_pk = self._fused_leaf_step(
                    flat_parents, acts.reshape(-1), enabled
                )
                fused_legal = (pl_pk, sw_pk)
            else:
                flat_leaf_states = self._fused_leaf_step(
                    flat_parents, acts.reshape(-1), enabled
                )
            leaf_states = jax.tree.map(
                lambda x: x.reshape((B, V_) + x.shape[1:]), flat_leaf_states
            )
        else:
            def leaf_states_one(tree, ls):
                def one_leaf(leaf):
                    p = tree.parent[leaf]
                    a = tree.parent_action[leaf]
                    parent_state = jax.tree.map(
                        lambda x: x[jnp.maximum(p, 0)], tree.state
                    )
                    stepped = engine.step(parent_state, jnp.maximum(a, 0))
                    root_state = jax.tree.map(lambda x: x[0], tree.state)
                    is_root = leaf == 0
                    return jax.tree.map(
                        lambda a_, b_: jnp.where(is_root, b_, a_),
                        stepped, root_state,
                    )

                return jax.vmap(one_leaf)(ls)

            leaf_states = jax.vmap(leaf_states_one)(tree_b, leaves)  # [B, V, ...]
        return leaf_states, fused_legal

    def _eval_and_topk(self, params, tree_b: Tree, leaves, created):
        """Shared middle of a pallas wave: step + write leaf nodes +
        evaluate + top-K legal priors.  Returns (tree_b, pending) where
        `pending` is everything the expand+backup kernel consumes."""
        engine = self.engine
        V = self.config.wave_size
        B = leaves.shape[0]
        leaf_states, fused_legal = self._leaf_states_of(tree_b, leaves)
        flat_states = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), leaf_states
        )
        policy, value = self.eval_fn(params, flat_states)
        value = value.reshape(B, V)
        leaf_results = flat_states.result.reshape(B, V)

        # top-K prior selection stays in XLA; the row installs and
        # the V backup walks happen in one fused kernel
        if fused_legal is not None:
            from ..engine.pallas_env import masked_topk_packed

            vals, aidx = masked_topk_packed(
                engine, policy, *fused_legal, self.config.max_children
            )
        else:
            legal = jax.vmap(engine.legal_mask)(flat_states)
            vals, aidx = masked_topk(
                policy, legal, self.config.max_children, self._topk_impl
            )
        tree_b = jax.vmap(self._write_nodes)(
            tree_b, leaves, created, leaf_states, leaf_results
        )
        # raw NN values: the expand+backup kernel swaps in anchored game
        # outcomes for terminal leaves (MCTS._leaf_values semantics)
        pending = (
            leaves, vals.reshape(B, V, -1), aidx.reshape(B, V, -1),
            leaf_results, value, leaf_states.to_move.reshape(B, V),
        )
        return tree_b, pending

    def _wave(self, params, tree_b: Tree, gumbel=None, wave_idx=None):
        V = self.config.wave_size
        engine = self.engine

        if gumbel is None:
            tree_b, leaves, created = self._descend(tree_b)  # [B, V]
        else:
            off = wave_idx * V
            tree_b, leaves, created = jax.vmap(
                lambda t, g: self._descend_wave(t, g, off)
            )(tree_b, gumbel)

        if self._use_pallas:
            tree_b, pending = self._eval_and_topk(
                params, tree_b, leaves, created
            )
            return self._expand_backup(tree_b, *pending)

        B = leaves.shape[0]
        leaf_states, _ = self._leaf_states_of(tree_b, leaves)
        flat_states = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), leaf_states
        )
        policy, value = self.eval_fn(params, flat_states)
        value = value.reshape(B, V)
        leaf_results = flat_states.result.reshape(B, V)
        policy = policy.reshape(B, V, -1)
        tree_b = jax.vmap(self._write_and_expand)(
            tree_b, leaves, created, leaf_states, leaf_results, policy
        )
        values = jax.vmap(self._leaf_values)(tree_b, leaves, leaf_states, value)
        return jax.vmap(self._backup_xla)(tree_b, leaves, values)

    def _wave_pipelined(self, params, tree_b: Tree, pending):
        """One pipelined wave: apply the previous wave's expansions and
        backups fused with this wave's descents (one merged kernel), then
        step/evaluate the new leaves.  `pending` carries the evaluation
        results between scan iterations (valid=0 on the first wave);
        callers must flush the final pending with `_expand_backup`."""
        tree_b, leaves, created = self._backup_descend(tree_b, pending)
        tree_b, new_pending = self._eval_and_topk(
            params, tree_b, leaves, created
        )
        return tree_b, new_pending + (jnp.int32(1),)

    # -- public API ----------------------------------------------------------

    @cached_property
    def prepare_root(self):
        """Expand unexpanded roots with one evaluation (rollout #1 upstream)."""

        @jax.jit
        def run(params, tree_b: Tree):
            root_states = jax.tree.map(lambda x: x[:, 0], tree_b.state)
            policy, value = self.eval_fn(params, root_states)
            legal = jax.vmap(self.engine.legal_mask)(root_states)

            def per_game(tree, prow, lg):
                def expand(t):
                    return t.replace(
                        root_prior=prow,
                        root_legal=lg,
                        expanded=t.expanded.at[0].set(True),
                        n0=t.n0 + 1,
                    )

                return jax.lax.cond(
                    tree.expanded[0], lambda t: t, expand, tree
                )

            return jax.vmap(per_game)(tree_b, policy, legal)

        return run

    @cached_property
    def run_sims(self):
        """Full search: scan `num_waves` waves over the batch of trees.
        On the VMEM pallas tier the scan is software-pipelined: each
        iteration runs ONE merged backup+descend kernel (the previous
        wave's expansions/backups fused with this wave's descents), and
        a trailing expand_backup flushes the last wave — bit-identical
        results, one tree DMA round per wave instead of two.

        With `scan_chunk` set, the jitted program covers only
        ceil(scan_chunk/wave_size) waves and is called in a host loop on
        the persistent tree until num_waves is reached (same op
        sequence; compile time decoupled from num_sims)."""
        total_waves = self.config.num_waves
        chunk_waves = total_waves
        if self.config.scan_chunk:
            chunk_waves = min(
                total_waves,
                -(-self.config.scan_chunk // self.config.wave_size),
            )
        n_chunks = -(-total_waves // chunk_waves)

        if self._backup_descend is not None:
            V = self.config.wave_size
            K = self.config.max_children

            @jax.jit
            def run_pipelined(params, tree_b: Tree):
                B = tree_b.n0.shape[0]
                zero_pending = (
                    jnp.zeros((B, V), jnp.int32),
                    jnp.zeros((B, V, K), jnp.float32),
                    jnp.zeros((B, V, K), jnp.int32),
                    jnp.zeros((B, V), jnp.int32),
                    jnp.zeros((B, V), jnp.float32),
                    jnp.zeros((B, V), jnp.int32),
                    jnp.int32(0),
                )

                def wave_step(carry, _):
                    tree_b, pending = carry
                    tree_b, pending = self._wave_pipelined(
                        params, tree_b, pending
                    )
                    return (tree_b, pending), None

                (tree_b, pending), _ = jax.lax.scan(
                    wave_step, (tree_b, zero_pending), None,
                    length=chunk_waves,
                )
                return self._expand_backup(tree_b, *pending[:-1])

            if n_chunks == 1:
                return run_pipelined

            def run_chunked(params, tree_b: Tree):
                for _ in range(n_chunks):
                    tree_b = run_pipelined(params, tree_b)
                return tree_b

            return run_chunked

        @jax.jit
        def run(params, tree_b: Tree):
            def wave_step(tree_b, _):
                return self._wave(params, tree_b), None

            tree_b, _ = jax.lax.scan(
                wave_step, tree_b, None, length=chunk_waves
            )
            return tree_b

        if n_chunks == 1:
            return run

        def run_chunked_xla(params, tree_b: Tree):
            for _ in range(n_chunks):
                tree_b = run(params, tree_b)
            return tree_b

        return run_chunked_xla

    @cached_property
    def run_sims_gumbel(self):
        """Jitted full Gumbel search (config.gumbel_m > 0): one Gumbel
        sample per game drives sequential halving at the root.  Dirichlet
        noise is not used with Gumbel search (the noise IS the Gumbels)."""
        if self.config.gumbel_m <= 0:
            raise ValueError("set SearchConfig.gumbel_m > 0 for gumbel search")

        @jax.jit
        def run(params, tree_b: Tree, rng):
            B, A = tree_b.root_prior.shape
            gumbel = jax.random.gumbel(rng, (B, A))

            def wave_step(tree_b, wave_idx):
                return self._wave(params, tree_b, gumbel, wave_idx), None

            tree_b, _ = jax.lax.scan(
                wave_step, tree_b, jnp.arange(self.config.num_waves)
            )
            return tree_b, gumbel

        return run

    @cached_property
    def select_moves_gumbel(self):
        """Deterministic Gumbel move choice: argmax over visited root
        actions of g + log pi + sigma(completed q) (the paper's A_{n+1})."""

        @jax.jit
        def run(tree_b: Tree, gumbel):
            def per_game(tree, g):
                scores = self._gumbel_scores(tree, g)
                visited = tree.root_n > 0
                sel = jnp.where(visited, scores, -jnp.inf)
                use = jnp.where(jnp.any(visited), sel, scores)
                return _argmax_last(use)

            return jax.vmap(per_game)(tree_b, gumbel).astype(jnp.int32)

        return run

    @cached_property
    def gumbel_policy_weights(self):
        """Improved policy for training targets: softmax over legal actions
        of log pi + sigma(completed q) (no Gumbel noise — the expectation)."""

        @jax.jit
        def run(tree_b: Tree):
            def per_game(tree):
                scores = self._gumbel_scores(tree, jnp.zeros_like(tree.root_w))
                return jax.nn.softmax(scores)

            return jax.vmap(per_game)(tree_b)

        return run

    @staticmethod
    def _gamma_fixed(rng, alpha, shape, iters: int = 4):
        """Gamma(alpha) sampler with a FIXED iteration count.

        `jax.random.gamma`'s rejection loop lowers to a data-dependent
        `while_loop` that costs ~3 s for a (32, 9036) draw on this
        backend (measured; tools/profile_move_phases.py) — 80% of a
        512-sim self-play move.  This is Marsaglia-Tsang (2000) squeeze
        sampling unrolled to `iters` fixed tries (vectorized, no control
        flow): per-try acceptance is >95% for the boosted alpha+1, so
        P(no accept) < 1e-5; stragglers fall back to the distribution
        mean.  alpha < 1 uses the exact boost Gamma(a) =
        Gamma(a+1) * U^(1/a).
        """
        boost_needed = alpha < 1.0
        a = jnp.where(boost_needed, alpha + 1.0, alpha)
        d = a - 1.0 / 3.0
        c = 1.0 / jnp.sqrt(9.0 * d)
        rng, k_boost = jax.random.split(rng)
        keys = jax.random.split(rng, 2 * iters)

        out = jnp.full(shape, d, jnp.float32)  # fallback: the mean
        accepted = jnp.zeros(shape, bool)
        for i in range(iters):
            x = jax.random.normal(keys[2 * i], shape)
            u = jax.random.uniform(keys[2 * i + 1], shape, minval=1e-12)
            v = (1.0 + c * x) ** 3
            ok = (v > 0) & (
                jnp.log(u) < 0.5 * x * x + d - d * v
                + d * jnp.log(jnp.maximum(v, 1e-12))
            )
            take = ok & ~accepted
            out = jnp.where(take, d * v, out)
            accepted = accepted | ok
        boost = jax.random.uniform(k_boost, shape, minval=1e-12) ** (1.0 / alpha)
        return jnp.where(boost_needed, out * boost, out)

    @cached_property
    def add_noise(self):
        """Dirichlet root noise: p <- ratio*noise + (1-ratio)*p (noise.rs:6-16)."""

        @jax.jit
        def run(rng, tree_b: Tree, alpha, ratio, apply_mask):
            B, A = tree_b.root_prior.shape
            gammas = self._gamma_fixed(rng, alpha, (B, A))
            gammas = jnp.where(tree_b.root_legal, gammas, 0.0)
            noise = gammas / jnp.maximum(gammas.sum(-1, keepdims=True), 1e-30)
            mixed = ratio * noise + (1.0 - ratio) * tree_b.root_prior
            new_prior = jnp.where(
                tree_b.root_legal & apply_mask[:, None], mixed, tree_b.root_prior
            )
            return tree_b.replace(root_prior=new_prior)

        return run

    @cached_property
    def select_moves(self):
        """Pick a move per game: argmax visits when `exploit`, else sample
        proportional to visits (play.rs:49-67; argmax ties -> last)."""

        @jax.jit
        def run(rng, tree_b: Tree, exploit):
            from .tree import root_visit_counts

            visits = jax.vmap(root_visit_counts)(tree_b)  # [B, A] int32
            greedy = jax.vmap(_argmax_last)(visits)
            logits = jnp.where(
                visits > 0, jnp.log(visits.astype(jnp.float32)), -jnp.inf
            )
            sampled = jax.random.categorical(rng, logits, axis=-1)
            return jnp.where(exploit, greedy, sampled).astype(jnp.int32)

        return run
