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
    def _reroot_batch(self):
        from .mcts.reuse import reroot

        k = self.search_config.max_children

        @jax.jit
        def run(tree, actions, states):
            return jax.vmap(
                lambda t, a, s: reroot(self.engine, t, a, s, k)
            )(tree, actions, states)

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
    def _any_win(self):
        """[B] bool: some legal move wins on the spot.  The full [B, A]
        win/legal tables cost ~400ms/move to read through the tunnel;
        this reads B bytes and the full tables are fetched only on a hit
        (rare: one readback per finished-by-tactics game)."""
        wins_fn = self._batched_wins

        @jax.jit
        def run(states):
            return jnp.any(wins_fn(states), axis=-1)

        return run

    @cached_property
    def _batched_legal(self):
        return self.engine.batched_legal_mask

    @cached_property
    def _root_visits_u16(self):
        dtype = jnp.uint16 if self._per_move_sims <= 65535 else jnp.int32
        return jax.jit(lambda tree: jax.vmap(root_visit_counts)(tree)
                       .astype(dtype))

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

        while active.any():
            plies = np.asarray(states.ply)

            # play forced opening moves on fresh boards
            fresh = (plies == 0) & active
            if fresh.any():
                first, second = self._opening_actions(rng, B)
                states = self._masked_step(states, jnp.asarray(first), jnp.asarray(fresh))
                states = self._masked_step(states, jnp.asarray(second), jnp.asarray(fresh))
                plies = np.asarray(states.ply)

            # instant-win scan: read the [B] any-win flag (one ~30ms
            # round trip), fetch the full win/legal tables only on a hit.
            # (Dispatch-only overlap with the search was measured SLOWER:
            # hit iterations — a large fraction, one per tactics-won
            # game — then pay a redundant search on top of the fetch.)
            reset_mask = np.zeros(B, bool)
            if cfg.instant_win_scan:
              with _Sect("win_dispatch"):
                any_win_dev = self._any_win(states)
              with _Sect("win_scan"):
                any_win = np.asarray(any_win_dev) & active
                if any_win.any():
                    fields = ("stacks", "heights", "tops", "to_move",
                              "ply", "stones", "caps", "half_komi",
                              "reversible", "result")
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

            # record examples: pre-move snapshot + root visit counts, or in
            # gumbel mode the improved policy scaled to integer weights.
            # ONE device_get round trip for everything (visits u16-packed
            # + snapshot fields): each separate np.asarray pays the ~29ms
            # tunnel RTT
            fields = ("stacks", "heights", "tops", "to_move", "ply",
                      "stones", "caps", "half_komi", "reversible", "result")
            with _Sect("visits_readback"):
                visits_dev = (self.mcts.gumbel_policy_weights(tree)
                              if self._gumbel else
                              self._root_visits_u16(tree))
                visits_all, host_vals = jax.device_get((
                    visits_dev,
                    tuple(getattr(states, k) for k in fields),
                ))
                if self._gumbel:
                    visits_all = np.round(visits_all * 65535.0).astype(np.int64)
                else:
                    visits_all = visits_all.astype(np.int64)
                host_states = dict(zip(fields, host_vals))

            for i in range(B):
                if not active[i]:
                    continue
                nz = np.nonzero(visits_all[i])[0].astype(np.int32)
                pending[i].append(Example(
                    state={k: v[i].copy() for k, v in host_states.items()},
                    actions=nz, visits=visits_all[i][nz].astype(np.int32),
                ))

            # play the chosen moves
            if os.environ.get("TAK_DEBUG_LEGAL"):
                legal_now = np.asarray(self._batched_legal(states))
                acts_np = np.asarray(actions)
                viz = np.asarray(jax.vmap(root_visit_counts)(tree))
                for i in range(B):
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
            with _Sect("step"):
                states = self._masked_step(states, actions,
                                           jnp.asarray(active))
                results = np.asarray(states.result)
            if cfg.tree_reuse:
                # carry each game's played subtree into the next search
                with _Sect("reroot"):
                    tree = self._reroot_batch(tree, actions, states)
                if not self.search_config.recycle:
                    # a carried subtree that nearly fills the pool would
                    # starve the next search (a full pool backs up into n0
                    # only, leaving root_n empty and select_moves blind) —
                    # blank those trees instead of carrying them.  With
                    # recycling the search evicts its own headroom.
                    room = self.search_config.max_nodes - self._per_move_sims
                    tree_stale |= np.asarray(tree.next_free) > room
            new_plies = np.asarray(states.ply)

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
