"""Network wrapper: on-device inference + reference-parity training step.

Replaces the reference's `Network` trait (alpha-tak/src/model/network.rs):

  * `policy_eval`   — batched planes -> (softmax policy [B, A], tanh value)
                      (forward_mcts, network.rs:32 / net6.rs:98-108).  Like
                      the reference, the softmax is over the FULL action
                      space (illegal logits included); search only reads
                      legal entries.
  * `train(...)`    — Adam(lr=1e-4) with classic L2 weight decay 1e-4
                      (network.rs:14-15,40-45), shuffled 500-example chunks,
                      optimizer step every 20 chunks => effective batch
                      10,000 examples (network.rs:17-21,92-96); each chunk
                      is expanded 8x by D4 symmetry on device
                      (example.rs:62-78); loss = -sum(pi * log_softmax)/B
                      + sum((z - v)^2)/B (network.rs:84-87).

The optimizer is rebuilt per `train` call, as upstream does.  Checkpoints
are flax-serialized msgpack of {params, batch_stats} (VarStore::save/load
equivalent, network.rs:29-30).
"""

from __future__ import annotations

import os
from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..engine.core import Engine
from ..engine.observe import observe
from .resnet import NetConfig, TakResNet, dummy_input

LEARNING_RATE = 1e-4
WEIGHT_DECAY = 1e-4
CHUNK_SIZE = 500
CHUNKS_IN_STEP = 20


class Network:
    def __init__(self, engine: Engine, config: NetConfig | None = None):
        self.engine = engine
        self.config = config or NetConfig.for_size(engine.n)
        self.model = TakResNet(self.config)

    # -- init / io -----------------------------------------------------------

    def init_variables(self, seed: int = 0):
        variables = self.model.init(
            jax.random.PRNGKey(seed), dummy_input(self.config), train=False
        )
        return variables  # {'params': ..., 'batch_stats': ...}

    def save(self, variables, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(variables)))
        os.replace(tmp, path)

    def load(self, path: str):
        template = self.init_variables(0)
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())

    # -- inference -----------------------------------------------------------

    @cached_property
    def _folded_model(self):
        import dataclasses

        return TakResNet(dataclasses.replace(self.config, fold_bn=True))

    def _fold_bn(self, variables):
        """Fold BatchNorm running statistics into the conv kernels/biases
        (y = gamma*(conv+b-mean)/sqrt(var+eps) + beta folds to a scaled
        kernel and shifted bias).  Standard inference deployment fold;
        removes every BN op from the forward.  Tiny (a few scalar-vector
        multiplies per layer), so it runs inside the jitted eval."""
        params = variables["params"]
        stats = variables["batch_stats"]
        eps = 1e-5  # flax nn.BatchNorm default

        def fold(conv_p, bn_p, bn_s):
            s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
            return {
                "kernel": conv_p["kernel"] * s,
                "bias": (conv_p["bias"] - bn_s["mean"]) * s + bn_p["bias"],
            }

        folded = {}
        for name, p in params.items():
            if name.startswith("BatchNorm"):
                continue
            if name == "Conv_0":  # stem
                folded[name] = fold(p, params["BatchNorm_0"],
                                    stats["BatchNorm_0"])
            elif name.startswith("ResBlock"):
                bs = stats[name]
                folded[name] = {
                    "Conv_0": fold(p["Conv_0"], p["BatchNorm_0"],
                                   bs["BatchNorm_0"]),
                    "Conv_1": fold(p["Conv_1"], p["BatchNorm_1"],
                                   bs["BatchNorm_1"]),
                }
            else:  # policy/value heads (no BN)
                folded[name] = p
        return {"params": folded}

    @cached_property
    def _policy_eval(self):
        dense = self.config.policy_head == "dense"
        if dense:
            # numpy (not jnp): this property may first be touched inside an
            # outer jit trace, where jnp.asarray would become a tracer and
            # leak out of scope via the closure
            legacy = self.engine.tables.legacy_actions
            A = self.engine.num_actions

        @jax.jit
        def run(variables, planes):
            logits, value = self._folded_model.apply(
                self._fold_bn(variables), planes, train=False
            )
            probs = jax.nn.softmax(logits, axis=-1)
            if dense:
                # scatter the legacy-list softmax into the channel-scheme
                # action space the search consumes (moves outside the
                # legacy list are geometrically impossible -> prior 0)
                full = jnp.zeros((probs.shape[0], A), probs.dtype)
                probs = full.at[:, legacy].set(probs)
            return probs, value

        return run

    def policy_eval(self, variables, planes):
        """planes [B, n, n, C] -> (policy [B, A] softmax, value [B])."""
        return self._policy_eval(variables, planes)

    @cached_property
    def observe_batch(self):
        return jax.jit(jax.vmap(partial(observe, self.engine)))

    def policy_eval_states(self, variables, states):
        return self.policy_eval(variables, self.observe_batch(states))

    # -- training ------------------------------------------------------------

    def make_optimizer(self):
        # classic Adam-with-L2: decay added to grads *before* Adam scaling,
        # matching tch's Adam { wd } (network.rs:40-45)
        return optax.chain(
            optax.add_decayed_weights(WEIGHT_DECAY),
            optax.adam(LEARNING_RATE),
        )

    def _symmetry_expand(self, planes, pi, z):
        """[B,...] -> [8B,...] via the D4 group, on device (example.rs:62)."""
        n = self.engine.n
        sq_inv = jnp.asarray(self.engine.tables.sym_square_inv)   # [8, n*n]
        if self.config.policy_head == "dense":
            act_inv = jnp.asarray(self.engine.tables.legacy_sym_action_inv)
        else:
            act_inv = jnp.asarray(self.engine.tables.sym_action_inv)  # [8, A]
        B = planes.shape[0]
        flat = planes.reshape(B, n * n, -1)

        def one_sym(sq_i, act_i):
            return flat[:, sq_i].reshape(planes.shape), pi[:, act_i]

        planes8, pi8 = jax.vmap(one_sym)(sq_inv, act_inv)  # [8, B, ...]
        return (
            planes8.reshape((8 * B,) + planes.shape[1:]),
            pi8.reshape(8 * B, -1),
            jnp.tile(z, 8),
        )

    def _loss(self, params, batch_stats, planes, pi, z):
        logits, value, new_model_state = self._apply_train(
            params, batch_stats, planes
        )
        B = logits.shape[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss_p = -jnp.sum(pi * logp) / B
        loss_z = jnp.sum(jnp.square(z - value)) / B
        return loss_p + loss_z, (new_model_state, loss_p, loss_z)

    def _apply_train(self, params, batch_stats, planes):
        out, new_state = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            planes,
            train=True,
            mutable=["batch_stats"],
        )
        logits, value = out
        return logits, value, new_state["batch_stats"]

    @cached_property
    def _accum_chunk(self):
        @jax.jit
        def run(params, batch_stats, grad_acc, planes, pi, z):
            planes, pi, z = self._symmetry_expand(planes, pi, z)
            (loss, (new_bs, lp, lz)), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(params, batch_stats, planes, pi, z)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            return grad_acc, new_bs, lp, lz

        return run

    @cached_property
    def optimizer(self):
        return self.make_optimizer()

    @cached_property
    def _apply_update(self):
        opt = self.optimizer

        @jax.jit
        def run(params, opt_state, grad_acc):
            updates, opt_state = opt.update(grad_acc, opt_state, params)
            params = optax.apply_updates(params, updates)
            zero = jax.tree.map(jnp.zeros_like, grad_acc)
            return params, opt_state, zero

        return run

    @cached_property
    def _build_pi(self):
        """(padded acts [C, W], vis [C, W]) -> [C, policy_size] normalized
        policy targets, built ON DEVICE from the sparse (actions, visits)
        pairs: the dense per-example numpy build (Example.policy_dense)
        cost ~14GB of host writes per 400k-example generation.  Padded
        width is bucketed to a power of two so only a handful of program
        shapes compile — and the jit lives on the Network (not rebuilt per
        train() call: even a compile-cache HIT costs ~750ms through this
        backend's tunnel, paid per generation and per width bucket).
        Matches policy_dense exactly (visit counts are < 2^24 so the f32
        sum is exact)."""
        An = self.engine.num_actions
        legacy = (jnp.asarray(self.engine.tables.legacy_actions)
                  if self.config.policy_head == "dense" else None)

        @jax.jit
        def build_pi(acts, vis):
            rows = jnp.arange(acts.shape[0])[:, None]
            pi = jnp.zeros((acts.shape[0], An), jnp.float32).at[
                rows, acts
            ].add(vis)
            pi = pi / jnp.maximum(vis.sum(-1, keepdims=True), 1.0)
            return pi if legacy is None else pi[:, legacy]

        return build_pi

    @staticmethod
    def _prestack(examples):
        """One pass over the epoch's examples: stacked state fields, a CSR
        (concatenated actions/visits + offsets) policy layout, and the
        result vector.  Per-chunk assembly then becomes pure numpy row
        gathers — the previous per-chunk Python loops (list-building +
        per-example padding, 800 chunks x 500 examples per 400k-example
        generation) were serial host work on the generation critical
        path (reference analog: network.rs:58-96 rebuilds tensors per
        chunk too, but on-host libtorch pays no dispatch tunnel)."""
        n_ex = len(examples)
        keys = examples[0].state.keys()
        states = {k: np.stack([e.state[k] for e in examples]) for k in keys}
        lens = np.fromiter((len(e.actions) for e in examples),
                           np.int64, n_ex)
        off = np.zeros(n_ex + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        cat_acts = (np.concatenate([e.actions for e in examples])
                    .astype(np.int64))
        cat_vis = (np.concatenate([e.visits for e in examples])
                   .astype(np.float32))
        z = np.fromiter((e.result for e in examples), np.float32, n_ex)
        return states, off, lens, cat_acts, cat_vis, z

    def _chunk_arrays(self, pre, idx):
        """Gather one chunk's (states, padded acts/vis, z) from the
        prestacked epoch — vectorized numpy, no per-example Python."""
        from ..types import GameState

        states, off, lens, cat_acts, cat_vis, z = pre
        sub = (GameState(**{k: jnp.asarray(v[idx]) for k, v in states.items()})
               if states else None)
        l = lens[idx]
        width = 1 << max(int(l.max()) - 1, 0).bit_length()
        cols = np.arange(width, dtype=np.int64)[None, :]
        mask = cols < l[:, None]
        pos = np.where(mask, off[idx][:, None] + cols, 0)
        acts = np.where(mask, cat_acts[pos], 0).astype(np.int32)
        vis = np.where(mask, cat_vis[pos], 0.0).astype(np.float32)
        return sub, jnp.asarray(acts), jnp.asarray(vis), jnp.asarray(z[idx])

    def train(self, variables, examples, *, rng=None, log=print,
              chunk_size: int | None = None, chunks_in_step: int | None = None,
              mesh=None, passes: int = 1):
        """`passes` training passes over `examples` (list of Example);
        passes=1 is reference parity.

        Shuffles example order (fresh shuffle per pass; ONE Adam state
        across passes), walks 500-example chunks, steps the fresh
        Adam every 20 chunks (network.rs:37-57).  Input planes are rebuilt
        on device from the stored game states (network.rs:59).
        `passes` > 1 is this framework's knob for small-buffer regimes
        (a reduced-scale run refreshes its buffer far slower than the
        reference's 1000 games/gen, so one pass per gate starves the
        candidate — the diagnosed round-4 plateau).

        With `mesh` (a jax.sharding.Mesh with a "dp" axis), every chunk's
        batch rows are laid out across the mesh's devices and parameters
        stay replicated — XLA inserts the gradient all-reduce over ICI.
        Same math, same effective batch; this is the data-parallel
        production path (SURVEY §7.6) the single-GPU reference lacks.
        """
        import time as _time

        if len(examples) == 0:  # tolerate empty input (no-op, ref parity)
            return variables
        chunk_size = chunk_size or CHUNK_SIZE
        chunks_in_step = chunks_in_step or CHUNKS_IN_STEP
        rng = rng or np.random.default_rng()
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = self.optimizer.init(params)  # fresh Adam state per call
        grad_acc = jax.tree.map(jnp.zeros_like, params)

        place_batch = lambda x: x
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            rep = replicated(mesh)
            shard = batch_sharding(mesh)
            place_batch = lambda x: jax.device_put(x, shard)
            params, batch_stats, opt_state, grad_acc = jax.device_put(
                (params, batch_stats, opt_state, grad_acc), rep
            )


        t0 = _time.time()
        pre = self._prestack(examples)
        n_chunks = len(examples) // chunk_size
        total_chunks = passes * n_chunks
        log(f"train: prestacked {len(examples)} examples in "
            f"{_time.time() - t0:.1f}s; {n_chunks} chunks"
            + (f" x {passes} passes" if passes > 1 else ""))
        done = 0
        for _ in range(passes):
            order = rng.permutation(len(examples))
            for i in range(n_chunks):
                idx = order[i * chunk_size : (i + 1) * chunk_size]
                sub_states, acts, vis, z = self._chunk_arrays(pre, idx)
                planes = self.observe_batch(sub_states)
                pi = self._build_pi(acts, vis)
                planes, pi, z = (place_batch(planes), place_batch(pi),
                                 place_batch(z))
                grad_acc, batch_stats, lp, lz = self._accum_chunk(
                    params, batch_stats, grad_acc, planes, pi, z
                )
                done += 1
                if done % chunks_in_step == 0:
                    log(f"chunk {done}/{total_chunks} p={float(lp):.4f} "
                        f"z={float(lz):.4f} step")
                    params, opt_state, grad_acc = self._apply_update(
                        params, opt_state, grad_acc
                    )
        if total_chunks % chunks_in_step != 0:
            # trailing partial accumulation: the reference drops it
            # (network.rs:37-57), which it can afford at 800 chunks per
            # 400k-example pass — but with a small buffer (< 20 chunks)
            # dropping it means NO optimizer step at all and the
            # candidate equals the incumbent
            log(f"chunk {total_chunks}/{total_chunks} p={float(lp):.4f} "
                f"z={float(lz):.4f} step (trailing flush)")
            params, opt_state, grad_acc = self._apply_update(
                params, opt_state, grad_acc
            )
        dt = _time.time() - t0
        if dt > 0:
            log(f"train: {total_chunks} chunks in {dt:.1f}s "
                f"({total_chunks * chunk_size / dt:,.0f} examples/s)")
        return {"params": params, "batch_stats": batch_stats}
