"""Run-resume: an interrupted training run continues bit-identically.

The reference's resume is a manual restart pointing at the last
`_models/*.model` + `_examples/*.data` (train/src/main.rs:46-82); this
framework checkpoints the full run (incumbent weights + replay buffer +
generation counter) every generation and resumes exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.examples import ReplayBuffer, example_to_line
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig
from tak_tpu.pit import PitConfig
from tak_tpu.selfplay import SelfPlayConfig
from tak_tpu.train_loop import (
    TrainLoopConfig, load_training_run, training_loop,
)

SEED = 7


def _setup(workdir, generations):
    engine = get_engine(3)
    net = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    net.train = functools.partial(net.train, chunk_size=8, chunks_in_step=1)
    cfg = TrainLoopConfig(
        selfplay=SelfPlayConfig(
            games=2, workers=2, komi=0, max_plies=40,
            search=SearchConfig(num_sims=8, wave_size=4, max_children=16),
        ),
        pit=PitConfig(
            games=2, komi=0, max_plies=40,
            search=SearchConfig(num_sims=8, wave_size=4, max_children=16),
        ),
        generations=generations,
        workdir=str(workdir),
    )
    return engine, net, cfg


def _buffer_lines(engine, buffer):
    return [example_to_line(engine, ex) for ex in buffer.examples]


def test_resume_matches_uninterrupted(tmp_path):
    # --- run A: two generations straight through -----------------------
    wd_a = tmp_path / "a"
    wd_a.mkdir()
    engine, net_a, cfg_a = _setup(wd_a, generations=2)
    vars_a0 = net_a.init_variables(SEED)
    buf_a = ReplayBuffer()
    vars_a = training_loop(engine, net_a, vars_a0, buf_a, cfg_a,
                           log=lambda *_: None, seed=SEED)

    # --- run B: one generation, then resume from the checkpoint --------
    wd_b = tmp_path / "b"
    wd_b.mkdir()
    engine, net_b, cfg_b1 = _setup(wd_b, generations=1)
    vars_b0 = net_b.init_variables(SEED)
    buf_b = ReplayBuffer()
    training_loop(engine, net_b, vars_b0, buf_b, cfg_b1,
                  log=lambda *_: None, seed=SEED)

    vars_r, buf_r, gen = load_training_run(engine, net_b, str(wd_b))
    assert gen == 1
    assert len(buf_r) == len(buf_b)
    engine, net_b2, cfg_b2 = _setup(wd_b, generations=2)
    vars_b = training_loop(engine, net_b2, vars_r, buf_r, cfg_b2,
                           log=lambda *_: None, seed=SEED,
                           start_generation=gen)

    # final incumbents identical
    flat_a = jax.tree.leaves(vars_a)
    flat_b = jax.tree.leaves(vars_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    # replay buffers identical (text codec is the storage format)
    assert _buffer_lines(engine, buf_a) == _buffer_lines(engine, buf_r)


def test_checkpoint_artifacts_written(tmp_path):
    engine, net, cfg = _setup(tmp_path, generations=1)
    variables = net.init_variables(SEED)
    training_loop(engine, net, variables, ReplayBuffer(), cfg,
                  log=lambda *_: None, seed=SEED)
    ckpt = tmp_path / "_checkpoint"
    assert (ckpt / "variables.msgpack").exists()
    assert (ckpt / "buffer.data").exists()
    assert (ckpt / "meta.json").exists()
