"""Generational loop + network training integration (offline, tiny)."""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.examples import Example, ReplayBuffer, state_to_host
from tak_tpu.game import Game
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig


def _fake_examples(engine, count, rng):
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


def test_train_updates_params_and_decreases_loss():
    engine = get_engine(3)
    net = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    variables = net.init_variables(0)
    rng = np.random.default_rng(0)
    examples = _fake_examples(engine, 60, rng)

    losses = []
    new_vars = net.train(
        variables, examples, rng=np.random.default_rng(1),
        chunk_size=10, chunks_in_step=2,
        log=lambda m: losses.append(m),
    )
    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"], new_vars["params"],
    )
    assert max(jax.tree.leaves(deltas)) > 0
    assert losses  # step logs emitted


def test_replay_buffer_window():
    buf = ReplayBuffer(max_examples=5)
    engine = get_engine(3)
    rng = np.random.default_rng(0)
    buf.extend(_fake_examples(engine, 8, rng))
    buf.truncate()
    assert len(buf) == 5


def test_buffer_save_load_roundtrip(tmp_path):
    engine = get_engine(3)
    rng = np.random.default_rng(2)
    buf = ReplayBuffer()
    buf.extend(_fake_examples(engine, 4, rng))
    path = str(tmp_path / "ex.data")
    buf.save(engine, path)
    buf2 = ReplayBuffer()
    buf2.load(engine, path)
    assert len(buf2) == 4
    for a, b in zip(buf.examples, buf2.examples):
        assert np.array_equal(a.actions, b.actions)
        assert np.array_equal(a.visits, b.visits)
        assert a.result == b.result


def test_policy_targets_match_policy_dense():
    """Device-built sparse policy targets == Example.policy_dense, both
    policy heads, through the prestacked CSR chunk path
    (network.py _prestack/_chunk_arrays/_build_pi)."""
    import numpy as np

    from tak_tpu.engine.core import get_engine
    from tak_tpu.examples import Example
    from tak_tpu.model.network import Network
    from tak_tpu.model.resnet import NetConfig

    engine = get_engine(5)
    rng = np.random.default_rng(3)
    chunk = []
    for _ in range(7):
        k = int(rng.integers(1, 40))
        acts = rng.choice(engine.num_actions, size=k, replace=False)
        chunk.append(Example(
            state={}, actions=np.sort(acts).astype(np.int32),
            visits=rng.integers(1, 500, k).astype(np.int32),
        ))
    for head in ("conv", "dense"):
        net = Network(engine, NetConfig(n=5, filters=16, blocks=1,
                                        policy_head=head))
        pre = net._prestack(chunk)
        # gather in a shuffled order to exercise the CSR row gather
        idx = np.array([3, 0, 6, 2, 5, 1, 4])
        _, acts, vis, z = net._chunk_arrays(pre, idx)
        got = np.asarray(net._build_pi(acts, vis))[np.argsort(idx)]
        if head == "dense":
            legacy = np.asarray(engine.tables.legacy_actions)
            want = np.stack([
                e.policy_dense(engine.num_actions)[legacy] for e in chunk
            ])
        else:
            want = np.stack([
                e.policy_dense(engine.num_actions) for e in chunk
            ])
        np.testing.assert_array_equal(got, want, err_msg=head)


def test_train_empty_examples_is_noop():
    """Public train() API tolerates an empty example list (advisor r4)."""
    engine = get_engine(3)
    net = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    variables = net.init_variables(0)
    out = net.train(variables, [], log=lambda m: None)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"], out["params"],
    )
    assert max(jax.tree.leaves(deltas)) == 0.0


def test_train_passes_more_steps():
    """passes=N walks the buffer N times under ONE Adam state and moves
    the params further than a single pass (small-buffer regime knob)."""
    engine = get_engine(3)
    net = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    variables = net.init_variables(0)
    rng = np.random.default_rng(0)
    examples = _fake_examples(engine, 40, rng)

    logs1, logs3 = [], []
    one = net.train(variables, examples, rng=np.random.default_rng(1),
                    chunk_size=10, chunks_in_step=2, log=logs1.append)
    three = net.train(variables, examples, rng=np.random.default_rng(1),
                      chunk_size=10, chunks_in_step=2, passes=3,
                      log=logs3.append)
    step_lines = [l for l in logs3 if l.endswith("step")]
    assert len(step_lines) == 3 * len([l for l in logs1 if l.endswith("step")])
    d1 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"], one["params"])))
    d3 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"], three["params"])))
    assert d3 > d1 > 0
