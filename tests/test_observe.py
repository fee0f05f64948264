"""NN input-plane parity (alpha-tak/src/repr/tests.rs).

The 12-plane expectation below is transcribed from the reference's
hand-written oracle (repr/tests.rs:20-111) for a 45-move 5x5 game,
evaluated from White's perspective.
"""

import numpy as np

from tak_tpu.engine.observe import observe
from tak_tpu.game import Game
from tak_tpu.sizes import board_channels, input_channels

MOVES = [
    "e3", "e2", "d2", "Sd3", "d4", "c4", "Cb3", "Cb4", "c3", "c2", "c3-",
    "c3", "b3>", "b3", "a3", "b2", "a3>", "a3", "a1", "a3>", "Sb1", "a2",
    "Se5", "a3", "b1<", "a3-", "2a1+", "a4", "c5", "b5", "d5", "b5>",
    "Sb1", "b5", "b1>", "b5>", "d5<", "d1", "c1<", "c1", "b1<", "d1<",
    "a1>", "d1", "b1>",
]

# 12 channel planes, each 5x5 row-major (row 0 = rank 1), x=True, o=False
x, o = True, False
HANDMADE = [
    # my flats
    [o,o,o,o,o, o,o,x,x,x, o,o,o,o,o, o,o,o,x,o, o,o,x,o,o],
    # en flats
    [o,o,o,x,o, o,x,o,o,o, o,x,o,o,x, x,o,x,o,o, o,o,o,o,o],
    # my walls
    [o,o,x,o,o, x,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,o,o,x],
    # en walls
    [o,o,o,o,o, o,o,o,o,o, o,o,o,x,o, o,o,o,o,o, o,o,o,o,o],
    # my caps
    [o,o,o,o,o, o,o,o,o,o, o,o,x,o,o, o,o,o,o,o, o,o,o,o,o],
    # en caps
    [o,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,x,o,o,o, o,o,o,o,o],
    # my second layer
    [o,o,o,o,o, x,o,o,o,o, o,x,o,o,o, o,o,o,o,o, o,o,o,o,o],
    # en second layer
    [o,o,x,o,o, o,o,x,o,o, o,o,x,o,o, o,o,o,o,o, o,o,x,o,o],
    # my third layer
    [o,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,o,o,o],
    # en third layer
    [o,o,x,o,o, x,o,o,o,o, o,x,o,o,o, o,o,o,o,o, o,o,x,o,o],
    # my fourth layer
    [o,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,x,o,o],
    # en fourth layer
    [o,o,o,o,o, x,o,o,o,o, o,o,o,o,o, o,o,o,o,o, o,o,o,o,o],
]


def test_empty_board_is_zero():
    g = Game(5)
    planes = np.asarray(observe(g.engine, g.state))
    assert planes.shape == (5, 5, input_channels(5))
    assert (planes[:, :, : board_channels(5)] == 0).all()


def test_complicated_board_planes():
    g = Game.from_ptn_moves(5, MOVES)
    # reference evaluates board_repr from White's perspective explicitly
    state = g.state.replace(to_move=np.int32(0))
    planes = np.asarray(observe(g.engine, state))
    want = np.asarray(HANDMADE, np.float32).reshape(12, 5, 5)
    got = np.moveaxis(planes[:, :, :12], -1, 0)
    assert (got == want).all(), np.argwhere(got != want)
    # channels 12.. of the board block are all zero (no deeper stacks)
    assert (planes[:, :, 12: board_channels(5)] == 0).all()


def test_reserve_and_scalar_planes():
    g = Game.from_ptn_moves(5, ["a1", "e5", "c3"])
    planes = np.asarray(observe(g.engine, g.state))
    C = board_channels(5)
    # black to move: my stones = black = 20 (a1 swap), en = white = 19
    # (e5 swap placement + c3), one-hot at count-1
    my_stones = planes[0, 0, C : C + 21]
    en_stones = planes[0, 0, C + 21 : C + 42]
    assert my_stones.argmax() == 19 and my_stones.sum() == 1
    assert en_stones.argmax() == 18 and en_stones.sum() == 1
    # caps present for both
    assert planes[0, 0, C + 42] == 1 and planes[0, 0, C + 43] == 1
    # colour plane: black to move -> 0
    assert planes[0, 0, C + 44] == 0
    # fcd plane: white has 2 flats, black 1 -> (2-1)/25
    assert abs(planes[0, 0, C + 45] - 1 / 25) < 1e-6
