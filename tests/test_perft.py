"""Perft parity with the reference oracle counts (tak/tests/perft.rs).

These exact node counts are the primary correctness oracle for the rules
engine: they cover placements, spreads, carry limits, wall smashing,
suicide moves, endgame filling, and reserve exhaustion.
"""

import pytest

from tak_tpu.engine.perft import perft
from tak_tpu.game import Game

# (name, size, ptn moves, [(depth, count), ...]) — perft.rs:20-98
MIDGAME = [
    ("move_stack", 5, ["d3", "c3", "c4", "1d3<", "1c4-", "Sc4"],
     [(1, 87), (2, 6_155)]),
    ("carry_limit", 5,
     ["c2", "c3", "d3", "b3", "c4", "1c2+", "1d3<", "1b3>", "1c4-", "Cc2",
      "a1", "1c2+", "a2"],
     [(1, 104), (2, 7_743)]),
    ("suicide", 5,
     ["c4", "c2", "d2", "c3", "b2", "d3", "1d2+", "b3", "d2", "b4", "1c2+",
      "1b3>", "2d3<", "1c4-", "d4", "5c3<23", "c2", "c4", "1d4<", "d3",
      "1d2+", "1c3+", "Cc3", "2c4>", "1c3<", "d2", "c3", "1d2+", "1c3+",
      "1b4>", "2b3>11", "3c4-12", "d2", "c4", "b4", "c5", "1b3>", "1c4<",
      "3c3-", "e5", "e2"],
     [(1, 85), (2, 11_206)]),
    ("endgame", 5,
     ["a5", "b4", "c3", "d2", "e1", "d1", "c2", "d3", "c1", "d4", "d5",
      "c4", "c5", "b3", "b2", "a2", "Sb1", "a3", "Ce4", "Cb5", "a4", "a1",
      "e5", "e3", "c3<", "Sc3", "c1>", "c1", "2d1+", "c3-", "c3", "a3>",
      "a3", "d1", "e4<", "2c2>", "c2", "e2", "b2+", "b2"],
     [(1, 65), (2, 4_072)]),
    ("reserves", 5,
     ["a1", "b1", "c1", "d1", "e1", "e2", "d2", "c2", "b2", "a2", "a3",
      "b3", "c3", "d3", "e3", "a4", "b4", "c4", "d4", "e4", "a5", "a4-",
      "b4-", "c4-", "d4-", "e4-", "a4", "b4", "c4", "d4", "e4", "2a3>",
      "c4>", "2e3<", "a3", "4b3-", "b3", "c4", "e3", "d5", "d2<", "d2",
      "2d4-", "d4", "c5", "b5", "2c2>", "d1+", "c2", "e2+", "d1", "e2",
      "c5<", "c5", "e4<", "Se4", "2b5-", "e4-", "a3-"],
     [(1, 152), (2, 15_356)]),
]

MIDGAME_DEEP = {  # depth-3/4 counts, slow on CPU (perft.rs)
    "move_stack": [(3, 461_800)],
    "carry_limit": [(3, 592_645)],
    "suicide": [(3, 957_000)],
    "endgame": [(3, 272_031), (4, 16_642_760)],
    "reserves": [(3, 1_961_479)],
}


def test_perft_5_openings():
    g = Game(5)
    for depth, want in [(0, 1), (1, 25), (2, 600), (3, 43_320)]:
        assert perft(g.engine, g.state, depth) == want


def test_perft_6_openings():
    g = Game(6)
    for depth, want in [(0, 1), (1, 36), (2, 1_260), (3, 132_720)]:
        assert perft(g.engine, g.state, depth) == want


@pytest.mark.parametrize("name,size,moves,checks", MIDGAME,
                         ids=[c[0] for c in MIDGAME])
def test_perft_midgame(name, size, moves, checks):
    g = Game.from_ptn_moves(size, moves)
    for depth, want in checks:
        assert perft(g.engine, g.state, depth) == want, (name, depth)


@pytest.mark.slow
@pytest.mark.parametrize("name,size,moves,_checks", MIDGAME,
                         ids=[c[0] for c in MIDGAME])
def test_perft_midgame_deep(name, size, moves, _checks):
    g = Game.from_ptn_moves(size, moves)
    for depth, want in MIDGAME_DEEP.get(name, []):
        assert perft(g.engine, g.state, depth) == want, (name, depth)


@pytest.mark.slow
def test_perft_deep_openings():
    g5 = Game(5)
    assert perft(g5.engine, g5.state, 4) == 2_999_784
    g6 = Game(6)
    assert perft(g6.engine, g6.state, 4) == 13_586_048
