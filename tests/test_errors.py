"""PlayError taxonomy parity (tak/src/error.rs variants)."""

import pytest

from tak_tpu.actions import parse_move
from tak_tpu.errors import PlayError, diagnose
from tak_tpu.game import Game, IllegalMove


CASES = [
    # (setup moves, offending move, expected error)
    ([], "Sc3", PlayError.OPENING_NON_FLAT),
    ([], "Cc3", PlayError.OPENING_NON_FLAT),
    (["a1", "e5"], "a1", PlayError.ALREADY_OCCUPIED),
    (["a1", "e5"], "c3>", PlayError.EMPTY_SQUARE),
    (["a1", "e5"], "a1>", PlayError.STACK_NOT_OWNED),  # a1 is black's
    (["a1", "e5", "c3", "c4"], "2c3+", PlayError.STACK_SIZE),
    (["a1", "e5"], "f1", PlayError.OUT_OF_BOUNDS),      # 5x5 board
    (["a1", "e5", "e1", "d5"], "e1>", PlayError.SPREAD_OUT_OF_BOUNDS),
    (["a1", "e5", "c3", "Sc4"], "c3+", PlayError.WALL_IN_WAY),
    (["a1", "e5", "c3", "Cc4"], "c3+", PlayError.CAP_IN_WAY),
]


@pytest.mark.parametrize("setup,move,err", CASES,
                         ids=[c[2].name for c in CASES])
def test_diagnosis(setup, move, err):
    g = Game.from_ptn_moves(5, setup)
    assert diagnose(g, parse_move(move)) == err
    with pytest.raises(IllegalMove, match=err.value[:20]):
        g.play(move)


def test_no_capstone_and_no_stones():
    g = Game.from_ptn_moves(5, ["a1", "e5", "Cc3", "Cc4"])
    # both capstones gone (5x5 has 1 each)
    assert diagnose(g, parse_move("Cd4")) == PlayError.NO_CAPSTONE
    # legal moves diagnose as None
    assert diagnose(g, parse_move("d4")) is None
