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
(player.rs:61-110): each *wave* runs `wave_size` virtual-loss descents per
game (pure index walks — node states are stored in the tree, so the env
steps once per simulation), evaluates all B*wave_size leaves in one fused
network forward, then devirtualizes.  The whole search for a move is one
jitted `lax.scan` over waves.

Known deviation from the reference (documented): a node created earlier in
the same wave is "pending" (its NN prior hasn't arrived).  The reference
descends through such nodes using uniform temporary priors
(mcts.rs:42-47); here the descent stops at the pending node and its
evaluation (already in flight this wave) is reused.  With the reference's
own self-play configuration (one descent per game per wave,
self_play.rs:181-210) the two behaviors are identical.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial

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
    max_children: int = 96      # K: stored edges per non-root node
    node_budget: int | None = None  # tree capacity; default fits num_sims
    exploration_base: float = EXPLORATION_BASE
    exploration_init: float = EXPLORATION_INIT

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


# descent status codes
_DESC, _CREATE, _LEAF = 0, 1, 2


class MCTS:
    """Batched search bound to an engine and an evaluation function.

    eval_fn(params, states_with_leading_batch) -> (policy [*, A], value [*])
    where policy is a softmax over the full action space (net6.rs:98-108).
    """

    def __init__(self, engine: Engine, eval_fn, config: SearchConfig):
        self.engine = engine
        self.eval_fn = eval_fn
        self.config = config

    # -- tree construction ---------------------------------------------------

    def init_batch(self, root_states: GameState) -> Tree:
        """Fresh trees for a batch of root states (leading axis B)."""
        return jax.vmap(
            lambda s: init_tree(
                self.engine, s, self.config.max_nodes, self.config.max_children
            )
        )(root_states)

    # -- selection -----------------------------------------------------------

    def _c_puct(self, n):
        cfg = self.config
        return (
            jnp.log((1.0 + n + cfg.exploration_base) / cfg.exploration_base)
            + cfg.exploration_init
        )

    def _child_stats(self, tree: Tree, child):
        has = child != NONE
        ci = jnp.maximum(child, 0)
        cn = jnp.where(has, tree.n[ci], 0).astype(jnp.float32)
        cv = jnp.where(has, tree.virt[ci], 0).astype(jnp.float32)
        cw = jnp.where(has, tree.w[ci], 0.0)
        tot = cn + cv
        q = jnp.where(tot > 0, (cw - cv) / jnp.maximum(tot, 1.0), 0.0)
        return q, tot

    def _select_root(self, tree: Tree):
        n0 = (tree.n[0] + tree.virt[0]).astype(jnp.float32)
        q, tot = self._child_stats(tree, tree.root_child)
        u = self._c_puct(n0) * tree.root_prior * jnp.sqrt(n0) / (1.0 + tot)
        scores = jnp.where(tree.root_legal, q + u, -jnp.inf)
        return _argmax_last(scores)

    def _select_edge(self, tree: Tree, node):
        acts = tree.edge_action[node]
        valid = acts != NONE
        np_ = (tree.n[node] + tree.virt[node]).astype(jnp.float32)
        q, tot = self._child_stats(tree, tree.edge_child[node])
        u = self._c_puct(np_) * tree.edge_prior[node] * jnp.sqrt(np_) / (1.0 + tot)
        scores = jnp.where(valid, q + u, -jnp.inf)
        return _argmax_last(scores)

    # -- backups -------------------------------------------------------------

    def _backup_virtual(self, tree: Tree, leaf):
        def cond(c):
            return c[0] != NONE

        def body(c):
            cur, t = c
            t = t.replace(virt=t.virt.at[cur].add(1))
            return (t.parent[cur], t)

        _, tree = jax.lax.while_loop(cond, body, (leaf, tree))
        return tree

    def _backup_concrete(self, tree: Tree, leaf):
        winner = result_winner(tree.result[leaf])  # -1 draw, 0 white, 1 black

        def cond(c):
            return c[0] != NONE

        def body(c):
            cur, t = c
            to_move = t.state.to_move[cur]
            reward = jnp.where(
                winner < 0, 0.0, jnp.where(to_move == winner, -1.0, 1.0)
            )
            t = t.replace(
                n=t.n.at[cur].add(1), w=t.w.at[cur].add(reward)
            )
            return (t.parent[cur], t)

        _, tree = jax.lax.while_loop(cond, body, (leaf, tree))
        return tree

    def _backup_devirtualize(self, tree: Tree, leaf, value):
        def cond(c):
            return c[0] != NONE

        def body(c):
            cur, sign, t = c
            t = t.replace(
                n=t.n.at[cur].add(1),
                virt=t.virt.at[cur].add(-1),
                w=t.w.at[cur].add(sign * value),
            )
            return (t.parent[cur], -sign, t)

        _, _, tree = jax.lax.while_loop(cond, body, (leaf, jnp.float32(-1.0), tree))
        return tree

    # -- descent -------------------------------------------------------------

    def _descend(self, tree: Tree):
        """One virtual-loss descent of a single game's tree.

        Returns (tree, leaf, needs_devirt).
        """
        a0 = self._select_root(tree)
        c0 = tree.root_child[a0]

        def loop_cond(carry):
            return carry[1] == _DESC

        def loop_body(carry):
            cur, status, cp, cs, ca = carry
            is_term = tree.result[cur] != ONGOING
            is_pending = ~tree.expanded[cur]
            slot = self._select_edge(tree, cur)
            action = tree.edge_action[cur, slot]
            child = tree.edge_child[cur, slot]
            stop_here = is_term | is_pending
            create = ~stop_here & (child == NONE)
            status = jnp.where(stop_here, _LEAF, jnp.where(create, _CREATE, _DESC))
            cp = jnp.where(create, cur, cp)
            cs = jnp.where(create, slot, cs)
            ca = jnp.where(create, action, ca)
            cur = jnp.where(status == _DESC, child, cur)
            return (cur, status, cp, cs, ca)

        init_status = jnp.where(c0 == NONE, _CREATE, _DESC)
        init = (
            jnp.where(c0 == NONE, 0, c0),
            init_status,
            jnp.int32(0),  # create-parent (root)
            jnp.int32(-1),  # create-slot; -1 marks "root edge" (use action)
            a0,            # create-action
        )
        cur, status, cp, cs, ca = jax.lax.while_loop(loop_cond, loop_body, init)

        # materialize the new node if the descent stopped at an empty edge
        def do_create(t: Tree):
            idx = t.next_free
            parent_state = jax.tree.map(lambda x: x[cp], t.state)
            new_state = self.engine.step(parent_state, ca)
            state = jax.tree.map(
                lambda arr, leafv: arr.at[idx].set(leafv), t.state, new_state
            )
            from_root = cs == NONE
            root_child = jnp.where(
                from_root, t.root_child.at[ca].set(idx), t.root_child
            )
            edge_child = jnp.where(
                from_root,
                t.edge_child,
                t.edge_child.at[cp, jnp.maximum(cs, 0)].set(idx),
            )
            return t.replace(
                state=state,
                result=t.result.at[idx].set(new_state.result),
                parent=t.parent.at[idx].set(cp),
                parent_action=t.parent_action.at[idx].set(ca),
                root_child=root_child,
                edge_child=edge_child,
                next_free=idx + 1,
            )

        # pool-exhaustion guard: when the node budget is spent (possible
        # only with an explicit small node_budget during open-ended
        # pondering), fall back to re-evaluating the would-be parent
        can_create = tree.next_free < self.config.max_nodes
        created = (status == _CREATE) & can_create
        new_idx = tree.next_free
        tree = jax.lax.cond(created, do_create, lambda t: t, tree)
        leaf = jnp.where(
            created, new_idx, jnp.where(status == _CREATE, cp, cur)
        )

        is_term = tree.result[leaf] != ONGOING
        tree = jax.lax.cond(
            is_term,
            self._backup_concrete,
            self._backup_virtual,
            tree,
            leaf,
        )
        return tree, leaf, ~is_term

    # -- evaluation application ----------------------------------------------

    def _expand_edges(self, tree: Tree, leaf, policy_row):
        leaf_state = jax.tree.map(lambda x: x[leaf], tree.state)
        legal = self.engine.legal_mask(leaf_state)
        masked = jnp.where(legal, policy_row, -1.0)
        vals, idx = jax.lax.top_k(masked, self.config.max_children)
        ok = vals >= 0.0
        return tree.replace(
            edge_action=tree.edge_action.at[leaf].set(
                jnp.where(ok, idx, NONE)
            ),
            edge_prior=tree.edge_prior.at[leaf].set(jnp.where(ok, vals, 0.0)),
            expanded=tree.expanded.at[leaf].set(True),
        )

    def _expand_root(self, tree: Tree, policy_row):
        root_state = jax.tree.map(lambda x: x[0], tree.state)
        legal = self.engine.legal_mask(root_state)
        return tree.replace(
            root_prior=policy_row,
            root_legal=legal,
            expanded=tree.expanded.at[0].set(True),
        )

    def _apply_eval(self, tree: Tree, leaf, policy_row, value):
        tree = jax.lax.cond(
            leaf == 0,
            lambda t: self._expand_root(t, policy_row),
            lambda t: self._expand_edges(t, leaf, policy_row),
            tree,
        )
        return self._backup_devirtualize(tree, leaf, value)

    # -- waves ----------------------------------------------------------------

    def _wave(self, params, tree_b: Tree):
        V = self.config.wave_size

        def descents(tree):
            def one(t, _):
                t, leaf, devirt = self._descend(t)
                return t, (leaf, devirt)

            tree, (leaves, devirts) = jax.lax.scan(one, tree, None, length=V)
            return tree, leaves, devirts

        tree_b, leaves, devirts = jax.vmap(descents)(tree_b)  # [B, V]

        leaf_states = jax.vmap(
            lambda t, ls: jax.tree.map(lambda x: x[ls], t.state)
        )(tree_b, leaves)  # leading [B, V]
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), leaf_states
        )
        policy, value = self.eval_fn(params, flat)
        B = leaves.shape[0]
        policy = policy.reshape(B, V, -1)
        value = value.reshape(B, V)

        def apply_one_game(tree, leaves, devirts, policy, value):
            def one(t, inp):
                leaf, dv, prow, val = inp
                t = jax.lax.cond(
                    dv,
                    lambda tt: self._apply_eval(tt, leaf, prow, val),
                    lambda tt: tt,
                    t,
                )
                return t, None

            tree, _ = jax.lax.scan(one, tree, (leaves, devirts, policy, value))
            return tree

        return jax.vmap(apply_one_game)(tree_b, leaves, devirts, policy, value)

    # -- public API ------------------------------------------------------------

    @cached_property
    def prepare_root(self):
        """Expand unexpanded roots with one evaluation (rollout #1 upstream)."""

        @jax.jit
        def run(params, tree_b: Tree):
            root_states = jax.tree.map(lambda x: x[:, 0], tree_b.state)
            policy, value = self.eval_fn(params, root_states)

            def per_game(tree, prow, val):
                def expand(t):
                    t = self._expand_root(t, prow)
                    return t.replace(
                        n=t.n.at[0].add(1), w=t.w.at[0].add(-val)
                    )

                return jax.lax.cond(
                    tree.expanded[0], lambda t: t, expand, tree
                )

            return jax.vmap(per_game)(tree_b, policy, value)

        return run

    @cached_property
    def run_sims(self):
        """Jitted full search: scan `num_waves` waves over the batch of trees."""

        @jax.jit
        def run(params, tree_b: Tree):
            def wave_step(tree_b, _):
                return self._wave(params, tree_b), None

            tree_b, _ = jax.lax.scan(
                wave_step, tree_b, None, length=self.config.num_waves
            )
            return tree_b

        return run

    @cached_property
    def add_noise(self):
        """Dirichlet root noise: p <- ratio*noise + (1-ratio)*p (noise.rs:6-16)."""

        @jax.jit
        def run(rng, tree_b: Tree, alpha, ratio, apply_mask):
            B, A = tree_b.root_prior.shape
            gammas = jax.random.gamma(rng, alpha, (B, A))
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
            logits = jnp.where(visits > 0, jnp.log(visits.astype(jnp.float32)), -jnp.inf)
            sampled = jax.random.categorical(rng, logits, axis=-1)
            return jnp.where(exploit, greedy, sampled).astype(jnp.int32)

        return run
