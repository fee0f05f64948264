"""Lockstep self-play actor: the training-data hot path.

TPU-native redesign of `train/src/self_play.rs:96-262`
(self_play_parallel): `workers` games run in lockstep, every move is one
batched MCTS (waves of virtual-loss descents fused with network
evaluation), and finished games are reset in place until the generation
quota is met.  Reference-parity behaviors:

  * komi 2; forced opening `a1` then a random far-corner reply
    (self_play.rs:110-117; generalized to any board size)
  * instant-win scan before searching: if any legal move wins on the
    spot, record a fake policy (1000 visits on winning moves, 1 on every
    other legal move) and finish the game without search
    (self_play.rs:119-171)
  * Dirichlet noise alpha=0.2 ratio=0.3 at the root while ply < 80
    (self_play.rs:14-16,173-180)
  * 10,000 rollouts per move; sample move by visit count before ply 40,
    argmax after (self_play.rs:12,18,220)
  * one example per searched move (game snapshot + root visit counts),
    completed at game end with +-1/0 from the mover's perspective
    (self_play.rs:222-256, player.rs:171-193)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .engine.core import Engine
from .examples import Example
from .mcts.search import MCTS, SearchConfig
from .mcts.tree import root_visit_counts
from .types import ONGOING, GameState, result_winner

INSTANT_WIN_VISITS = 1000  # fake visits for winning moves (self_play.rs:131)
# per-move readback compaction: top-K (visit, action) pairs per game.
# Exact whenever a root has <= K visited children (6x6 legal-move counts
# top out well under 400; overflows fall back to a dense fetch)
SPARSE_VISITS = 512
# training-example snapshot: the GameState fields that identify a position
SNAPSHOT_FIELDS = ("stacks", "heights", "tops", "to_move", "ply",
                   "stones", "caps", "half_komi", "reversible", "result")
# default node pool for recycled searches: fits the VMEM kernel tier
# (edge tier ~3KB/node at lane-padded K) with headroom for the engine
# state arrays; eviction serves sim budgets far beyond the pool size
RECYCLE_POOL = 1280


@dataclass
class SelfPlayConfig:
    games: int = 1000            # SELF_PLAY_GAMES (self_play.rs:10)
    workers: int = 32            # lockstep games (self_play.rs:94)
    komi: int = 2
    search: SearchConfig = field(default_factory=SearchConfig)
    noise_alpha: float = 0.2
    noise_ratio: float = 0.3
    noise_plies: int = 80
    exploit_plies: int = 40
    instant_win_scan: bool = True
    tree_reuse: bool = True      # keep the played subtree (play.rs:26-43)
    max_plies: int = 400         # safety valve for pathological games
    # reference sequential self-play quadruples rollouts while
    # ply < QUAD_ROLLOUT_PLIES (self_play.rs:19,63-67); exact for
    # workers == 1 (the only configuration the reference uses it in)
    quad_rollout_plies: int = 0


class SelfPlayActor:
    def __init__(self, engine: Engine, eval_fn, config: SelfPlayConfig,
                 mesh=None):
        """`mesh` (jax.sharding.Mesh with a "dp" axis): lay the lockstep
        game batch out across devices — env steps, tree waves, and the
        in-search network evals then run dp-sharded with replicated
        params (SURVEY §7.6; the reference is single-GPU, §2.7).
        `workers` should be a multiple of the dp size."""
        self.engine = engine
        self.config = config
        self.mesh = mesh
        if config.quad_rollout_plies > 0 and config.workers != 1:
            raise ValueError(
                "quad_rollout_plies matches the reference's SEQUENTIAL "
                "self-play (self_play.rs:21-92) and requires workers=1"
            )
        search = config.search
        if search.node_budget is None:
            import dataclasses

            per_move = search.num_sims * (
                4 if config.quad_rollout_plies > 0 else 1
            )
            if search.recycle:
                # recycling serves any sim budget from a bounded pool:
                # size it to the VMEM kernel tier (the whole point — deep
                # searches at fused-kernel speed), unless the search is
                # small enough to fit outright
                budget = min(RECYCLE_POOL, per_move * 2 + 2)
                budget = max(budget, 4 * search.wave_size)
                if search.scan_chunk is None and search.num_sims > 1024:
                    # deep searches: chunk the wave scan so compile time
                    # does not grow with the sim budget
                    search = dataclasses.replace(search, scan_chunk=512)
            else:
                # carried subtree (< num_sims nodes) + one move's
                # simulations; quad-rollout moves search up to 4x num_sims
                budget = per_move + 2 + (per_move if config.tree_reuse else 0)
            search = dataclasses.replace(search, node_budget=budget)
        self._per_move_sims = search.num_sims * (
            4 if config.quad_rollout_plies > 0 else 1
        )
        self.search_config = search
        self.mcts = MCTS(engine, eval_fn, search)
        # Gumbel mode (search.gumbel_m > 0): sequential halving replaces
        # PUCT at the root, the Gumbel sample replaces Dirichlet noise, and
        # policy targets come from the improved policy softmax(log pi +
        # sigma(q)) instead of visit counts (Danihelka et al. 2022).
        self._gumbel = search.gumbel_m > 0

    # -- jitted helpers ------------------------------------------------------

    @cached_property
    def _masked_step(self):
        return self.engine.batched_step_masked

    @cached_property
    def _masked_reset(self):
        fresh = self.engine.initial(2 * self.config.komi)

        @jax.jit
        def run(states: GameState, mask):
            return jax.tree.map(
                lambda cur, init: jnp.where(
                    mask.reshape((-1,) + (1,) * (cur.ndim - 1)),
                    jnp.broadcast_to(init, cur.shape),
                    cur,
                ),
                states,
                jax.tree.map(lambda x: x, fresh),
            )

        return run

    @cached_property
    def _masked_tree_reset(self):
        """Blank per-game trees in place (fresh root at `states`)."""
        from .mcts.reuse import blank_trees

        return jax.jit(blank_trees)

    @cached_property
    def _batched_wins(self):
        if (jax.default_backend() != "cpu"
                and self.engine.fused_kernels_supported):
            return self.engine.wins_in_one_fused_fn()
        return jax.jit(jax.vmap(self.engine.wins_in_one))

    @cached_property
    def _batched_legal(self):
        return self.engine.batched_legal_mask

    @cached_property
    def _move_bundle(self):
        """Everything after `select_moves`, fused into ONE jitted program
        so the whole move needs a single `device_get`:

          * root visit counts of the searched tree, compacted on device to
            the top `SPARSE_VISITS` (value, action) pairs — 9036-wide u16
            rows cost ~580KB/move through the tunnel; the sparse rows are
            ~10x smaller and exact whenever a root has <= SPARSE_VISITS
            visited children (`nnz` is returned so the rare overflow can
            fall back to a dense fetch).  Values ride as exact int32 —
            with tree reuse a carried root can exceed 65535 visits, which
            silently wrapped the old uint16 packing.
          * the pre-move state snapshot fields (the training example),
          * the masked env step and (tree_reuse) the batched reroot,
          * post-step result/ply and — instant_win_scan — the NEXT move's
            [B] any-win flag, so the win scan costs no extra round trip
            (self_play.rs:119-171; freshly reset boards cannot win in one
            move at ply <= 2, so reset slots are masked off host-side).
        """
        cfg = self.config
        engine = self.engine
        fields = SNAPSHOT_FIELDS
        kvis = min(engine.num_actions, SPARSE_VISITS)
        step = engine.batched_step_masked
        k = self.search_config.max_children
        keep = self.search_config.reroot_keep
        wins_fn = self._batched_wins if cfg.instant_win_scan else None
        gumbel = self._gumbel
        gumbel_weights = self.mcts.gumbel_policy_weights if gumbel else None

        from .mcts.reuse import reroot

        @jax.jit
        def run(tree, states, actions, active):
            if gumbel:
                visits = jnp.round(
                    gumbel_weights(tree) * 65535.0).astype(jnp.int32)
            else:
                visits = jax.vmap(root_visit_counts)(tree)  # [B, A] int32
            # f32 top_k is exact for counts < 2^24 and avoids the integer
            # top_k slow path on this backend (docs/ROADMAP.md dead ends)
            vals, idx = jax.lax.top_k(visits.astype(jnp.float32), kvis)
            nnz = jnp.sum(visits > 0, axis=-1)
            snap = tuple(getattr(states, f) for f in fields)
            new_states = step(states, actions, active)
            if cfg.tree_reuse:
                new_tree = jax.vmap(
                    lambda t, a, s: reroot(engine, t, a, s, k, keep=keep)
                )(tree, actions, new_states)
            else:
                new_tree = tree
            if wins_fn is not None:
                any_win = jnp.any(wins_fn(new_states), axis=-1)
            else:
                any_win = jnp.zeros_like(active)
            return (new_tree, new_states, vals.astype(jnp.int32),
                    idx.astype(jnp.int32), nnz, snap, new_states.result,
                    new_states.ply, any_win, new_tree.next_free)

        return run

    @cached_property
    def _dense_visits_i32(self):
        """Fallback for the rare game whose root has more than
        SPARSE_VISITS visited children: dense [B, A] int32 counts."""
        if self._gumbel:
            gw = self.mcts.gumbel_policy_weights
            return jax.jit(
                lambda tree: jnp.round(gw(tree) * 65535.0).astype(jnp.int32))
        return jax.jit(
            lambda tree: jax.vmap(root_visit_counts)(tree).astype(jnp.int32))

    def _debug_check_legal(self, tree, states, actions, active, plies):
        """Opt-in (TAK_DEBUG_LEGAL) audit: every chosen action must be
        legal in the pre-step position; dumps the offending tree row."""
        legal_now = np.asarray(self._batched_legal(states))
        acts_np = np.asarray(actions)
        viz = np.asarray(jax.vmap(root_visit_counts)(tree))
        for i in range(len(acts_np)):
            if active[i] and not legal_now[i, acts_np[i]]:
                np.savez(
                    "/tmp/tak_illegal_action.npz",
                    game=i, action=acts_np[i], at_ply=plies[i],
                    visits=viz[i],
                    t_root_n=np.asarray(tree.root_n[i]),
                    t_root_virt=np.asarray(tree.root_virt[i]),
                    t_root_legal=np.asarray(tree.root_legal[i]),
                    t_root_prior=np.asarray(tree.root_prior[i]),
                    t_root_child=np.asarray(tree.root_child[i]),
                    t_expanded0=np.asarray(tree.expanded[i, 0]),
                    t_n0=np.asarray(tree.n0[i]),
                    t_virt0=np.asarray(tree.virt0[i]),
                    t_next_free=np.asarray(tree.next_free[i]),
                    t_result0=np.asarray(tree.result[i, 0]),
                    **{"s_" + k: np.asarray(getattr(states, k))
                       for k in ("stacks", "heights", "tops",
                                 "to_move", "ply", "stones", "caps",
                                 "result")},
                )
                raise AssertionError(
                    f"illegal action {acts_np[i]} chosen for game "
                    f"{i} at ply {plies[i]} (visits sum "
                    f"{viz[i].sum()}); dump: /tmp/tak_illegal_action.npz"
                )

    def _opening_actions(self, rng: np.random.Generator, count: int):
        """Forced a1, then a far corner at random (self_play.rs:110-117)."""
        n = self.engine.n
        first = np.full(count, 0, np.int32)  # flat placement at a1 (row0,col0)
        corners = np.array(
            [(n - 1) * n + 0, (n - 1) * n + (n - 1)], np.int32
        )  # a<n> / <last-file><n>
        second = corners[rng.integers(0, 2, size=count)]
        return first, second

    # -- main loop -----------------------------------------------------------

    def run(self, params, seed: int = 0, log=print, example_sink=None):
        """Produce one generation of examples.  Returns list[Example]."""
        cfg = self.config
        engine = self.engine
        B = cfg.workers
        rng = np.random.default_rng(seed)
        jrng = jax.random.PRNGKey(seed)

        states = engine.initial_batch(B, 2 * cfg.komi)
        if self.mesh is not None:
            from .parallel.mesh import shard_batch

            states = shard_batch(self.mesh, states)
        tree = None                     # persistent across moves (reuse)
        tree_stale = np.ones(B, bool)   # slots whose tree must be blanked
        pending: list[list[Example]] = [[] for _ in range(B)]
        completed_by_win = 0
        active = np.ones(B, bool)
        started = B
        completed = 0
        examples: list[Example] = []
        sims_done = 0
        t_start = time.time()

        def finish_slot(i, white_result):
            nonlocal completed, started
            for ex in pending[i]:
                to_move = int(ex.state["to_move"])
                ex.result = white_result if to_move == 0 else -white_result
            examples.extend(pending[i])
            if example_sink is not None:
                for ex in pending[i]:
                    example_sink(ex)
            pending[i] = []
            completed += 1
            return True  # caller resets the slot

        prof = os.environ.get("TAK_PROFILE_MOVES")
        prof_t = {}
        prof_moves = 0

        class _Sect:
            def __init__(self, name):
                self.name = name
            def __enter__(self):
                self.t0 = time.perf_counter()
            def __exit__(self, *a):
                prof_t[self.name] = prof_t.get(self.name, 0.0) + (
                    time.perf_counter() - self.t0)

        # host-tracked plies and any-win flags: both are deterministic
        # functions of the last bundled readback plus host-known resets
        # and openings, so the steady-state loop never issues a separate
        # read for them (each separate read costs a ~29ms tunnel RTT)
        plies = np.zeros(B, np.int64)
        any_win_host = np.zeros(B, bool)  # fresh boards can't win in one

        while active.any():
            # play forced opening moves on fresh boards
            fresh = (plies == 0) & active
            if fresh.any():
                first, second = self._opening_actions(rng, B)
                states = self._masked_step(states, jnp.asarray(first), jnp.asarray(fresh))
                states = self._masked_step(states, jnp.asarray(second), jnp.asarray(fresh))
                plies[fresh] += 2

            # instant-win scan: the [B] any-win flag rides in the previous
            # move's bundled readback (zero extra round trips); the full
            # win/legal tables are fetched only on a hit (rare: one per
            # tactics-won game).  (Dispatch-only overlap of the search
            # with the scan was measured SLOWER: hit iterations — one per
            # tactics-won game — then pay a redundant search on top.)
            reset_mask = np.zeros(B, bool)
            if cfg.instant_win_scan:
              with _Sect("win_scan"):
                any_win = any_win_host & active
                if any_win.any():
                    fields = SNAPSHOT_FIELDS
                    wins, legal, host_vals = jax.device_get((
                        self._batched_wins(states),
                        self._batched_legal(states),
                        tuple(getattr(states, k) for k in fields)))
                    host_states = dict(zip(fields, host_vals))
                    for i in np.nonzero(any_win)[0]:
                        acts = np.nonzero(legal[i])[0].astype(np.int32)
                        visits = np.where(wins[i][acts], INSTANT_WIN_VISITS,
                                          1).astype(np.int32)
                        pending[i].append(Example(
                            state={k: v[i].copy()
                                   for k, v in host_states.items()},
                            actions=acts, visits=visits,
                        ))
                        white_result = (
                            1.0 if int(host_states["to_move"][i]) == 0
                            else -1.0)
                        finish_slot(i, white_result)
                        completed_by_win += 1
                        reset_mask[i] = True
                if reset_mask.any():
                    any_win_host[reset_mask] = False
                    plies[reset_mask] = 0
                    if started < cfg.games:
                        started += int(reset_mask.sum())
                        states = self._masked_reset(
                            states, jnp.asarray(reset_mask))
                    else:
                        active &= ~reset_mask
                    tree_stale |= reset_mask
                    if not active.any():
                        break
                    continue  # fresh boards get openings next iteration

            # batched search (trees persist across moves when reuse is on)
            if tree is None or not cfg.tree_reuse:
                tree = self.mcts.init_batch(states)
                tree_stale[:] = False
            elif tree_stale.any():
                tree = self._masked_tree_reset(
                    tree, states, jnp.asarray(tree_stale)
                )
                tree_stale[:] = False
            with _Sect("prepare_root"):
                tree = self.mcts.prepare_root(params, tree)
            jrng, k1, k2 = jax.random.split(jrng, 3)
            if self._gumbel:
                tree, gumbel = self.mcts.run_sims_gumbel(params, tree, k1)
                actions = self.mcts.select_moves_gumbel(tree, gumbel)
            else:
                noise_mask = jnp.asarray((plies < cfg.noise_plies) & active)
                tree = self.mcts.add_noise(
                    k1, tree, cfg.noise_alpha, cfg.noise_ratio, noise_mask
                )
                with _Sect("run_sims"):
                    tree = self.mcts.run_sims(params, tree)
                    if (cfg.quad_rollout_plies > 0
                            and int(plies[0]) < cfg.quad_rollout_plies):
                        for _ in range(3):  # 4x total (self_play.rs:63-67)
                            tree = self.mcts.run_sims(params, tree)
                exploit = jnp.asarray(plies >= cfg.exploit_plies)
                with _Sect("select_moves"):
                    actions = self.mcts.select_moves(k2, tree, exploit)
            factor = 4 if (cfg.quad_rollout_plies > 0
                           and int(plies[0]) < cfg.quad_rollout_plies) else 1
            sims_done += factor * cfg.search.num_sims * int(active.sum())

            if os.environ.get("TAK_DEBUG_LEGAL"):
                self._debug_check_legal(tree, states, actions, active, plies)

            # dispatch the fused move tail (visit compaction + snapshot +
            # step + reroot + next any-win), then ONE device_get for the
            # whole move — every separate read pays the ~29ms tunnel RTT
            prev_tree = tree
            with _Sect("bundle_dispatch"):
                (tree, new_states, sp_vals_d, sp_idx_d, nnz_d, snap_d,
                 results_d, plies_d, any_win_d, next_free_d) = \
                    self._move_bundle(tree, states, actions,
                                      jnp.asarray(active))
            with _Sect("bundle_read"):
                (sp_vals, sp_idx, nnz, host_vals, results, new_plies,
                 any_win_host, next_free) = jax.device_get((
                     sp_vals_d, sp_idx_d, nnz_d, snap_d, results_d,
                     plies_d, any_win_d, next_free_d))
                host_states = dict(zip(SNAPSHOT_FIELDS, host_vals))

            overflow = (nnz > sp_vals.shape[1]) & active
            dense_all = None
            if overflow.any():  # more visited children than SPARSE_VISITS
                dense_all = np.asarray(self._dense_visits_i32(prev_tree))
            del prev_tree

            with _Sect("host_examples"):
                for i in range(B):
                    if not active[i]:
                        continue
                    if dense_all is not None and overflow[i]:
                        nz = np.nonzero(dense_all[i])[0].astype(np.int32)
                        vis = dense_all[i][nz].astype(np.int32)
                    else:
                        got = sp_vals[i] > 0
                        acts = sp_idx[i][got]
                        order = np.argsort(acts)  # ascending action id
                        nz = acts[order].astype(np.int32)
                        vis = sp_vals[i][got][order].astype(np.int32)
                    pending[i].append(Example(
                        state={k: v[i].copy()
                               for k, v in host_states.items()},
                        actions=nz, visits=vis,
                    ))

            # the bundle already stepped the env and rerooted the trees
            states = new_states
            plies = np.asarray(new_plies).astype(np.int64)
            any_win_host = np.array(any_win_host)  # writable copy
            if cfg.tree_reuse and not self.search_config.recycle:
                # a carried subtree that nearly fills the pool would
                # starve the next search (a full pool backs up into n0
                # only, leaving root_n empty and select_moves blind) —
                # blank those trees instead of carrying them.  With
                # recycling the search evicts its own headroom.
                room = self.search_config.max_nodes - self._per_move_sims
                tree_stale |= next_free > room

            reset_mask = np.zeros(B, bool)
            for i in range(B):
                if not active[i]:
                    continue
                over = results[i] != ONGOING or new_plies[i] >= cfg.max_plies
                if over:
                    winner = int(result_winner(results[i]))
                    white_result = 1.0 if winner == 0 else (-1.0 if winner == 1 else 0.0)
                    finish_slot(i, white_result)
                    reset_mask[i] = True
                    log(f"game {completed}/{cfg.games} done "
                        f"({new_plies[i]} plies, result {int(results[i])})")
            if reset_mask.any():
                tree_stale |= reset_mask
                plies[reset_mask] = 0
                any_win_host[reset_mask] = False
                if started < cfg.games:
                    started += int(reset_mask.sum())
                    states = self._masked_reset(states, jnp.asarray(reset_mask))
                else:
                    active &= ~reset_mask

            prof_moves += 1
            if prof and prof_moves % int(prof) == 0:
                tot = sum(prof_t.values())
                parts = " ".join(f"{k}={v/prof_moves*1e3:.0f}ms"
                                 for k, v in sorted(prof_t.items()))
                log(f"[prof] {prof_moves} moves, accounted "
                    f"{tot/prof_moves*1e3:.0f}ms/move: {parts} "
                    f"(games finished by instant win: {completed_by_win})")

            if completed >= cfg.games:
                break

        dt = time.time() - t_start
        if dt > 0:
            log(f"self-play: {completed} games, {len(examples)} examples, "
                f"{sims_done / dt:,.0f} sims/s")
        return examples
