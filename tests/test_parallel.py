"""Multi-device (dp-sharded) correctness on the virtual 8-device CPU mesh.

The reference is single-box (SURVEY §2.7); the dp path is this
framework's addition (SURVEY §7.6, BASELINE config 5).  These tests pin
down that (a) the sharded learner step computes the same update as the
single-device step, (b) `Network.train` with a mesh matches the host
loop, and (c) a full sharded training generation (self-play + train +
pit + checkpoint) runs end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.examples import Example, ReplayBuffer, state_to_host
from tak_tpu.game import Game
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig
from tak_tpu.parallel.learner import DPLearner
from tak_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from tak_tpu.pit import PitConfig
from tak_tpu.selfplay import SelfPlayConfig
from tak_tpu.sizes import input_channels
from tak_tpu.train_loop import TrainLoopConfig, training_loop

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh"
)


def _tiny_net(n=3):
    engine = get_engine(n)
    net = Network(engine, NetConfig(n=n, filters=8, blocks=1))
    return engine, net


def _fake_batch(engine, net, B, seed=0):
    rng = np.random.default_rng(seed)
    A = engine.num_actions
    planes = jnp.asarray(
        rng.normal(size=(B, engine.n, engine.n,
                         input_channels(engine.n))).astype(np.float32)
    )
    pi = rng.random((B, A)).astype(np.float32)
    pi = jnp.asarray(pi / pi.sum(-1, keepdims=True))
    z = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], size=B).astype(np.float32))
    return planes, pi, z


def test_dp_train_step_matches_single_device():
    engine, net = _tiny_net()
    variables = net.init_variables(0)
    planes, pi, z = _fake_batch(engine, net, B=16)

    # single-device reference step (same loss, same optimizer)
    import optax

    def single_step(params, batch_stats, opt_state, planes, pi, z):
        (loss, (new_bs, lp, lz)), grads = jax.value_and_grad(
            net._loss, has_aux=True
        )(params, batch_stats, planes, pi, z)
        updates, opt_state = net.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, lp, lz

    opt_state = net.optimizer.init(variables["params"])
    ref_params, ref_lp, ref_lz = jax.jit(single_step)(
        variables["params"], variables["batch_stats"], opt_state,
        planes, pi, z,
    )

    mesh = make_mesh(8)
    learner = DPLearner(net, mesh)
    sp, sp_pi, sp_z = learner.place(planes, pi, z)
    opt_state = learner.init_opt_state(variables["params"])
    dp_params, _, _, dp_lp, dp_lz = learner.train_step(
        variables["params"], variables["batch_stats"], opt_state,
        sp, sp_pi, sp_z,
    )

    np.testing.assert_allclose(float(ref_lp), float(dp_lp), rtol=1e-5)
    np.testing.assert_allclose(float(ref_lz), float(dp_lz), rtol=1e-5)

    # gradients agree up to f32 reassociation noise (the sharded step only
    # reorders batch reductions; conv-bias-before-BN grads are exactly 0
    # mathematically, so those leaves are noise-vs-noise — bound every
    # leaf by a fraction of its own scale)
    grad_fn = jax.jit(jax.grad(
        lambda p, bs, x, y, w: net._loss(p, bs, x, y, w)[0]
    ))
    g_ref = grad_fn(variables["params"], variables["batch_stats"],
                    planes, pi, z)
    g_dp = grad_fn(variables["params"], variables["batch_stats"],
                   sp, sp_pi, sp_z)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-2 * (1.0 + np.abs(a).max())
        assert np.abs(a - b).max() <= tol
    # post-Adam params differ by O(lr) where a gradient is ~0 (m/sqrt(v)
    # amplifies reassociation noise to +-lr): bound by 5e-4
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(dp_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-4)


def _real_examples(engine, count, rng):
    out = []
    g = Game(engine.n)
    for i in range(count):
        acts = rng.choice(engine.num_actions, size=5, replace=False)
        out.append(Example(
            state=state_to_host(g.state),
            actions=acts.astype(np.int32),
            visits=rng.integers(1, 50, size=5).astype(np.int32),
            result=float(rng.choice([-1.0, 0.0, 1.0])),
        ))
    return out


def test_network_train_mesh_matches_host_loop():
    engine, net = _tiny_net()
    variables = net.init_variables(1)
    examples = _real_examples(engine, 64, np.random.default_rng(3))

    host = net.train(variables, examples, rng=np.random.default_rng(9),
                     chunk_size=16, chunks_in_step=2, log=lambda *_: None)
    mesh = make_mesh(8)
    dp = net.train(variables, examples, rng=np.random.default_rng(9),
                   chunk_size=16, chunks_in_step=2, log=lambda *_: None,
                   mesh=mesh)
    for a, b in zip(jax.tree.leaves(host["params"]),
                    jax.tree.leaves(dp["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_generation_runs(tmp_path):
    engine, net = _tiny_net()
    net.train = functools.partial(net.train, chunk_size=8, chunks_in_step=1)
    variables = net.init_variables(0)
    mesh = make_mesh(8)
    cfg = TrainLoopConfig(
        selfplay=SelfPlayConfig(
            games=8, workers=8, komi=0, max_plies=40,
            search=SearchConfig(num_sims=8, wave_size=4, max_children=16),
        ),
        pit=PitConfig(
            games=2, komi=0, max_plies=40,
            search=SearchConfig(num_sims=8, wave_size=4, max_children=16),
        ),
        generations=2,
        workdir=str(tmp_path),
    )
    buffer = ReplayBuffer()
    out = training_loop(engine, net, variables, buffer, cfg,
                        log=lambda *_: None, seed=11, mesh=mesh)
    assert len(buffer) > 0
    assert (tmp_path / "_checkpoint" / "variables.msgpack").exists()
    assert jax.tree.leaves(out)  # incumbent returned


def test_sharded_env_states_are_distributed():
    engine, _ = _tiny_net()
    mesh = make_mesh(8)
    states = shard_batch(mesh, engine.initial_batch(16, 0))
    sh = states.ply.sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), states.ply.ndim)
    stepped = engine.batched_step(states, jnp.zeros(16, jnp.int32))
    assert not stepped.ply.sharding.is_fully_replicated
