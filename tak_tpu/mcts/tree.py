"""Tree-in-tensors storage for batched MCTS.

TPU-first replacement for the reference's pointer tree
(`alpha-tak/src/search/node.rs`): all nodes of all B concurrent searches
live in fixed-shape arrays, so select/expand/backup are row reads and
dense elementwise math under `jit`/`vmap`.

Statistics are EDGE-resident (visits/virtual-losses/reward sums live on
the parent's edge slot, and on dense per-action arrays at the root), not
node-resident: PUCT selection then needs only contiguous row reads —
scattered-element gathers are pathologically slow on TPU and never appear
on the hot path.  An edge's statistics are identical to its child node's
(node.rs:4-11): `edge_w[p, s]` is the reward sum from the perspective of
the player moving at `p`, exactly `Node::expected_reward * visits` of the
child (mcts.rs:53-64,120-124).

Layout (per game; batch leading axis added by vmap):

  * node tier [M]: the full `GameState` (so descents never re-step the
    env — the env steps once per simulation, batched at wave end), cached
    result, parent / parent_slot / parent_action links, `expanded` flag.
  * edge tier [M, K]: per stored child: action id, prior, child pointer,
    visits, virtual visits, reward sum.
  * root tier [A]: FULL-width prior / legal / child / visits / virtual /
    reward arrays over the whole action space, so Dirichlet noise
    (noise.rs:6-16) and visit-count policy targets (play.rs:13-21) are
    exact; only non-root nodes truncate to K.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..types import GameState

NONE = -1  # null node / unused edge slot


@struct.dataclass
class Tree:
    # node tier [M]
    state: GameState            # leading axis M on every leaf
    result: jnp.ndarray         # int32 [M] result code of the node's state
    parent: jnp.ndarray         # int32 [M] parent node (NONE for root)
    parent_slot: jnp.ndarray    # int32 [M] edge slot in parent (NONE = root edge)
    parent_action: jnp.ndarray  # int32 [M] action taken from parent
    expanded: jnp.ndarray       # bool [M] edges written (NN prior arrived)

    # recycling bookkeeping [M] (all-zero and unmaintained unless
    # SearchConfig.recycle; see mcts/search.py).  `node_n` mirrors the
    # node's parent-edge visit count (eviction score), `node_virt` pins
    # in-flight leaves (cursor stopped here, evaluation pending), and
    # `child_count` counts MATERIALIZED children — a node with
    # child_count == 0 holds no descendant statistics, so evicting it
    # loses only its cached state/priors (one extra eval on revisit),
    # never backed-up search statistics (those live on the parent edge).
    node_n: jnp.ndarray         # int32 [M]
    node_virt: jnp.ndarray      # int32 [M]
    child_count: jnp.ndarray    # int32 [M]

    # edge tier [M, K]
    edge_action: jnp.ndarray    # int32 [M, K] action id or NONE
    edge_prior: jnp.ndarray     # f32  [M, K]
    edge_child: jnp.ndarray     # int32 [M, K] node index or NONE
    edge_n: jnp.ndarray         # int32 [M, K] visits
    edge_virt: jnp.ndarray      # int32 [M, K] virtual visits
    edge_w: jnp.ndarray         # f32  [M, K] reward sum (parent-mover persp.)

    # root tier [A]
    root_prior: jnp.ndarray     # f32  [A]
    root_child: jnp.ndarray     # int32 [A]
    root_legal: jnp.ndarray     # bool [A]
    root_n: jnp.ndarray         # int32 [A]
    root_virt: jnp.ndarray      # int32 [A]
    root_w: jnp.ndarray         # f32  [A]
    n0: jnp.ndarray             # int32 scalar: root node visits
    virt0: jnp.ndarray          # int32 scalar: root node virtual visits

    next_free: jnp.ndarray      # int32 scalar: next unallocated node index


def init_tree(engine, root_state: GameState, max_nodes: int, k: int) -> Tree:
    """Fresh single-game tree with `root_state` at node 0 (unexpanded)."""
    M, K, A = max_nodes, k, engine.num_actions
    state = jax.tree.map(
        lambda x: jnp.zeros((M,) + x.shape, x.dtype).at[0].set(x), root_state
    )
    return Tree(
        state=state,
        result=jnp.zeros(M, jnp.int32).at[0].set(root_state.result),
        parent=jnp.full(M, NONE, jnp.int32),
        parent_slot=jnp.full(M, NONE, jnp.int32),
        parent_action=jnp.full(M, NONE, jnp.int32),
        expanded=jnp.zeros(M, bool),
        node_n=jnp.zeros(M, jnp.int32),
        node_virt=jnp.zeros(M, jnp.int32),
        child_count=jnp.zeros(M, jnp.int32),
        edge_action=jnp.full((M, K), NONE, jnp.int32),
        edge_prior=jnp.zeros((M, K), jnp.float32),
        edge_child=jnp.full((M, K), NONE, jnp.int32),
        edge_n=jnp.zeros((M, K), jnp.int32),
        edge_virt=jnp.zeros((M, K), jnp.int32),
        edge_w=jnp.zeros((M, K), jnp.float32),
        root_prior=jnp.zeros(A, jnp.float32),
        root_child=jnp.full(A, NONE, jnp.int32),
        root_legal=jnp.zeros(A, bool),
        root_n=jnp.zeros(A, jnp.int32),
        root_virt=jnp.zeros(A, jnp.int32),
        root_w=jnp.zeros(A, jnp.float32),
        n0=jnp.int32(0),
        virt0=jnp.int32(0),
        next_free=jnp.int32(1),
    )


def root_visit_counts(tree: Tree) -> jnp.ndarray:
    """Visit count per root action ([A]), the improved policy (play.rs:13-21)."""
    return jnp.where(tree.root_legal, tree.root_n, 0)


def root_child_rewards(tree: Tree) -> jnp.ndarray:
    """Expected reward per root action (0 where unvisited), [A]."""
    return jnp.where(
        tree.root_n > 0, tree.root_w / jnp.maximum(tree.root_n, 1), 0.0
    )
