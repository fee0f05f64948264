"""Every supported board size: JAX engine vs C++ oracle differential.

The reference only ships 5x5/6x6 nets, but its rules crate is
const-generic over 3..8; the framework must be correct on all of them.
"""

import numpy as np
import pytest

from tak_tpu.engine.perft import perft
from tak_tpu.game import Game
from tak_tpu.types import ONGOING

native = pytest.importorskip("tak_tpu.native")
if not native.available():
    pytest.skip("takcore native library unavailable", allow_module_level=True)


@pytest.mark.parametrize("n", [3, 4, 7, 8])
def test_perft_matches_native(n):
    g = Game(n)
    nat = native.NativeGame(n)
    for depth in (1, 2, 3):
        assert perft(g.engine, g.state, depth) == nat.perft(depth), (n, depth)


@pytest.mark.parametrize("n", [4, 7])
def test_playout_parity(n):
    g = Game(n)
    nat = native.NativeGame(n)
    seed = 9576890767
    for ply in range(120):
        if g.result != ONGOING:
            break
        acts = g.legal_actions()
        nat_acts = nat.legal_actions()
        assert np.array_equal(acts, nat_acts), (n, ply)
        a = int(acts[seed % len(acts)])
        g.play_action(a, check=False)
        nat.play_action(a)
        assert g.result == nat.result, (n, ply)
