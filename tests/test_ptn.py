"""PTN game-file and position parsing (analysis/src/parse.rs)."""

import numpy as np
import pytest

from tak_tpu.engine.core import get_engine
from tak_tpu.engine.ptn import parse_position, parse_ptn
from tak_tpu.engine.tps import state_to_tps
from tak_tpu.game import Game

PTN_FILE = """\
[Site "PlayTak.com"]
[Size "5"]
[Komi "2"]
[Flats "21"]
[Caps "1"]

1. d3 c3 {first comment}
2. c4 1d3<?
3. 1c4-!! Sc4
1-0
"""


def test_parse_ptn_headers_and_moves():
    engine = get_engine(5)
    state, moves = parse_ptn(engine, PTN_FILE)
    assert int(state.half_komi) == 4
    assert [str(m) for m in moves] == ["d3", "c3", "c4", "d3<", "c4-", "Sc4"]
    # replaying reaches the perft fixture position
    g = Game(5, state=state)
    for m in moves:
        g.play(str(m))
    assert g.ply == 6


def test_parse_ptn_size_mismatch():
    engine = get_engine(6)
    with pytest.raises(ValueError, match="size mismatch"):
        parse_ptn(engine, '[Size "5"]\n1. a1 b1\n')


def test_parse_ptn_with_tps_start():
    engine = get_engine(5)
    src = Game.from_ptn_moves(5, ["a1", "e5", "c3"])
    tps = state_to_tps(engine, src.state)
    state, moves = parse_ptn(
        engine, f'[Size "5"]\n[TPS "{tps}"]\n2. -- d3\n3. c4 b4\n'
    )
    assert int(state.ply) == 3
    assert [str(m) for m in moves] == ["d3", "c4", "b4"]


def test_parse_position_with_reserves():
    engine = get_engine(5)
    src = Game.from_ptn_moves(5, ["a1", "e5"])
    tps = state_to_tps(engine, src.state)
    state = parse_position(engine, f"{tps};10;1;11;0;3")
    assert np.asarray(state.stones).tolist() == [10, 11]
    assert np.asarray(state.caps).tolist() == [1, 0]
    assert int(state.half_komi) == 3


def test_parse_position_defaults_komi_2():
    engine = get_engine(5)
    src = Game.from_ptn_moves(5, ["a1", "e5"])
    tps = state_to_tps(engine, src.state)
    state = parse_position(engine, tps)
    assert int(state.half_komi) == 4
