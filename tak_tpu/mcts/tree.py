"""Tree-in-tensors storage for batched MCTS.

TPU-first replacement for the reference's pointer tree
(`alpha-tak/src/search/node.rs`): all nodes of all B concurrent searches
live in fixed-shape arrays, so select/expand/backup are gathers and
scatters under `jit`/`vmap`.

Layout (per game; batch leading axis added by vmap):

  * Node tier: every simulation allocates at most one node.  A node stores
    the full `GameState` it represents (so descents never re-step the env;
    the env `step` runs exactly once per simulation, at the leaf), its
    cached result (node.rs:7 / mcts.rs:38-40), its parent link, and its
    visit statistics.  `W` is the reward sum from the perspective of the
    player who moved INTO the node, matching `Node::expected_reward`
    conventions (mcts.rs:53-64).
  * Edge tier (top-K): an expanded node keeps its `K` highest-prior legal
    actions (edge_action/edge_prior) and lazily-created child pointers.
    Edge visit statistics ARE the child node's statistics (a child exists
    from the first traversal of its edge, like node.rs children that start
    unvisited).
  * Root tier: the root keeps FULL-width arrays over the whole action
    space (prior, child pointer, legal mask) so Dirichlet noise
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
    # node tier (shape [M] or [M, ...])
    state: GameState          # leading axis M on every leaf
    result: jnp.ndarray       # int32 [M] result code of the node's state
    parent: jnp.ndarray       # int32 [M] parent node (NONE for root)
    parent_action: jnp.ndarray  # int32 [M] action taken from parent
    n: jnp.ndarray            # int32 [M] real visits
    virt: jnp.ndarray         # int32 [M] virtual visits (pending evals)
    w: jnp.ndarray            # f32  [M] reward sum (parent-mover perspective)
    expanded: jnp.ndarray     # bool [M] edges written (NN prior arrived)

    # edge tier (top-K)
    edge_action: jnp.ndarray  # int32 [M, K] action id or NONE
    edge_prior: jnp.ndarray   # f32  [M, K]
    edge_child: jnp.ndarray   # int32 [M, K] node index or NONE

    # root tier (full action space A)
    root_prior: jnp.ndarray   # f32  [A]
    root_child: jnp.ndarray   # int32 [A]
    root_legal: jnp.ndarray   # bool [A]

    next_free: jnp.ndarray    # int32 scalar: next unallocated node index


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
        parent_action=jnp.full(M, NONE, jnp.int32),
        n=jnp.zeros(M, jnp.int32),
        virt=jnp.zeros(M, jnp.int32),
        w=jnp.zeros(M, jnp.float32),
        expanded=jnp.zeros(M, bool),
        edge_action=jnp.full((M, K), NONE, jnp.int32),
        edge_prior=jnp.zeros((M, K), jnp.float32),
        edge_child=jnp.full((M, K), NONE, jnp.int32),
        root_prior=jnp.zeros(A, jnp.float32),
        root_child=jnp.full(A, NONE, jnp.int32),
        root_legal=jnp.zeros(A, bool),
        next_free=jnp.int32(1),
    )


def root_visit_counts(tree: Tree) -> jnp.ndarray:
    """Visit count per root action ([A]), the improved policy (play.rs:13-21)."""
    child = tree.root_child
    counts = jnp.where(child != NONE, tree.n[jnp.maximum(child, 0)], 0)
    return jnp.where(tree.root_legal, counts, 0)


def root_child_rewards(tree: Tree) -> jnp.ndarray:
    """Expected reward per root action (0 where unvisited), [A]."""
    child = jnp.maximum(tree.root_child, 0)
    n = jnp.where(tree.root_child != NONE, tree.n[child], 0)
    w = jnp.where(tree.root_child != NONE, tree.w[child], 0.0)
    return jnp.where(n > 0, w / jnp.maximum(n, 1), 0.0)
