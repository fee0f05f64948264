"""TPS codec parity (tak/tests/tps.rs)."""

import numpy as np
import pytest

from tak_tpu.engine.tps import state_to_tps, tps_to_state
from tak_tpu.game import Game
from tak_tpu.types import ONGOING

SEEDS = [
    5915587277, 1500450271, 3267000013, 5754853343, 4093082899,
    9576890767, 3628273133, 2860486313, 5463458053, 3367900313,
]


def test_complicated_board():
    g = Game.from_ptn_moves(6, [
        "e1", "f2", "Sb5", "Cd6", "d3", "d4", "Sc1", "c3", "Ca6", "f6",
        "b1", "Sb4", "b3", "b2", "d5", "e1>", "d3>", "b2<", "Se2", "f4",
        "f2-", "c3-", "e4", "Sa5", "c3", "c5", "b5>", "a2-", "Sb5", "e6",
        "2c5-11", "d6>", "d5<", "b2", "b3-", "b3", "e3+", "e6>", "a4",
        "Sf5", "d6", "e6-", "f1+", "d4<", "d3", "d4", "b2>", "e3",
        "2e4+11", "a1>", "2c3>11", "Sc6", "d3-", "e4", "d5", "a2", "d5-",
        "a2+", "2c2+11", "c2", "d1", "c3>", "3c4-", "2d3-11", "Sa2", "c4",
        "2d2<11", "Sd2", "d3", "b3-", "f2+", "b3", "a1", "e4+", "d5",
        "2e5<11", "2d4>", "2b2>", "d5-", "d2+", "e4+", "d2", "c3<", "c3<",
        "e2<", "c2+", "c2<", "e2", "d5>", "c3<", "b2>", "d5", "d4>",
        "d5+", "c2<", "d5", "b2-", "d5>", "c2+", "b3>", "2d2<", "d2",
        "3c2+21", "d4", "e4<", "d5", "c2",
    ])
    want = ("1C,x,2S,12,1,22C/2S,1S,12,2,2112,2S/1,2S,21S,21,2,2/"
            "2,212,21222,12S,21S,1/1S,2,1,2,2,x/1,121,1S,12,x,2 2 54")
    assert state_to_tps(g.engine, g.state) == want


def _state_fields(engine, state):
    return (
        np.asarray(state.stacks).tolist(),
        np.asarray(state.heights).tolist(),
        np.asarray(state.tops).tolist(),
        int(state.to_move), int(state.ply),
        np.asarray(state.stones).tolist(),
        np.asarray(state.caps).tolist(),
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_tps_consistency(seed):
    """Deterministic playout; assert Game -> TPS -> Game equality each ply."""
    g = Game(5)
    while g.result == ONGOING:
        acts = g.legal_actions()
        g.play_action(int(acts[seed % len(acts)]), check=False)
        tps = state_to_tps(g.engine, g.state)
        back = tps_to_state(g.engine, tps)
        assert _state_fields(g.engine, g.state) == _state_fields(g.engine, back), tps
