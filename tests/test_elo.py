"""Elo ladder harness: BT fitting on synthetic records + a tiny live ladder."""

import numpy as np

from tak_tpu.elo import (
    LadderConfig, bradley_terry_elo, elo_ladder, expected_score,
)
from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig
from tak_tpu.pit import PitConfig


def test_bt_recovers_ordering():
    # players 0 < 1 < 2: 1 beats 0 75% of the time, 2 beats 1 75%
    score = np.zeros((3, 3))
    games = np.zeros((3, 3))
    for i, j, sij in [(1, 0, 75), (2, 1, 75), (2, 0, 93)]:
        score[i, j] = sij
        score[j, i] = 100 - sij
        games[i, j] = games[j, i] = 100
    elo = bradley_terry_elo(score, games)
    assert elo[0] == 0.0  # anchored
    assert elo[0] < elo[1] < elo[2]
    # 75% corresponds to ~191 Elo; MLE should land nearby
    assert 150 < elo[1] - elo[0] < 240
    assert 150 < elo[2] - elo[1] < 240


def test_bt_draws_and_unplayed():
    # all draws -> equal ratings; player 2 never plays -> stays at 0
    score = np.array([[0, 5.0, 0], [5.0, 0, 0], [0, 0, 0]])
    games = np.array([[0, 10.0, 0], [10.0, 0, 0], [0, 0, 0]])
    elo = bradley_terry_elo(score, games)
    assert abs(elo[1] - elo[0]) < 1.0
    assert elo[2] == 0.0


def test_bt_sweep_is_finite():
    score = np.array([[0, 10.0], [0.0, 0]])
    games = np.array([[0, 10.0], [10.0, 0]])
    elo = bradley_terry_elo(score, games)
    assert np.isfinite(elo).all()
    assert elo[0] > elo[1] + 300


def test_expected_score():
    assert abs(expected_score(0.0) - 0.5) < 1e-12
    assert 0.74 < expected_score(191) < 0.76


def test_tiny_ladder_runs():
    engine = get_engine(3)
    network = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    players = [(f"ckpt{i}", network.init_variables(i)) for i in range(3)]
    eval_fn = lambda p, s: network.policy_eval_states(p, s)
    cfg = LadderConfig(
        pit=PitConfig(
            games=2, komi=2, random_plies=2, max_plies=30,
            search=SearchConfig(num_sims=8, wave_size=2, max_children=16),
        ),
        schedule="adjacent",
    )
    result = elo_ladder(engine, eval_fn, players, cfg, seed=3,
                        log=lambda *a: None)
    assert set(result.ratings) == {"ckpt0", "ckpt1", "ckpt2"}
    assert len(result.matches) == 2
    for m in result.matches:
        assert m.wins + m.losses + m.draws == 2
    assert np.isfinite(list(result.ratings.values())).all()
    assert "elo" in result.table()
    assert "ratings" in result.to_json()
