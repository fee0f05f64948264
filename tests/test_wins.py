"""Win/termination rule parity (tak/tests/wins.rs)."""

from tak_tpu.game import Game
from tak_tpu.types import (
    BLACK_FLATS,
    BLACK_ROAD,
    DRAW_FLATS,
    WHITE_FLATS,
    WHITE_ROAD,
)


def test_dragon_clause():
    g = Game.from_ptn_moves(6, [
        "a4", "a3", "b3", "b4", "c3", "c4", "d3", "d4", "d3+", "e4", "e3",
        "f4", "f3", "Cb5", "d4-",
    ])
    assert g.result == WHITE_ROAD


def test_flat_win():
    g = Game.from_ptn_moves(3, [
        "a3", "c1", "c2", "c3", "b3", "b2", "b1", "a1", "a2",
    ])
    assert g.result == WHITE_FLATS


def test_road_win():
    g = Game.from_ptn_moves(5, [
        "d2", "a5", "b4", "d3", "Cc3", "Cc2", "b2", "b1", "b3", "a1", "c4",
        "c1", "e2", "e3",
    ])
    assert g.result == BLACK_ROAD


def test_road_beats_flats():
    g = Game.from_ptn_moves(3, [
        "a1", "c1", "c2", "a2", "Sa3", "b1", "Sb3", "b2", "c3",
    ])
    assert g.result == WHITE_ROAD


def test_board_fill_komi():
    g = Game.from_ptn_moves(4, [
        "a1", "a2", "b1", "b2", "c2", "c1", "d1", "d2", "d3", "c3", "b3",
        "a3", "a4", "b4", "c4", "d4",
    ])
    assert g.result == DRAW_FLATS
    # komi flips the tie: wins.rs:60-66
    for hk in (1, 2):
        st = g.state.replace(half_komi=hk)
        assert int(g.engine.compute_result_1(st)) == BLACK_FLATS
