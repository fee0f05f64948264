"""Action-space table invariants (move_map.rs / moves.rs parity)."""

import numpy as np
import pytest

from tak_tpu.actions import (
    Move,
    Tables,
    drops_to_pattern_mask,
    parse_move,
    pattern_mask_to_drops,
)
from tak_tpu.sizes import action_space, legacy_action_space


@pytest.mark.parametrize("n", [3, 4, 5, 6, 7, 8])
def test_counts(n):
    t = Tables(n)
    assert t.num_actions == action_space(n)
    assert len(t.legacy_actions) == legacy_action_space(n)
    # every action decodes and re-encodes to itself
    for a in range(0, t.num_actions, 7):
        assert t.move_to_action(t.action_to_move(a)) == a


def test_action_space_reference_values():
    assert action_space(6) == 9036   # moves.rs:29-31 / net6.rs output
    assert legacy_action_space(5) == 1575  # net5 policy head


def test_pattern_roundtrip():
    for n in (5, 6, 8):
        for mask in range(1, 2**n - 1):
            drops = pattern_mask_to_drops(mask, n)
            assert all(d >= 1 for d in drops)
            assert sum(d for d in drops) <= n
            assert drops_to_pattern_mask(drops, n) == mask


def test_ptn_roundtrip():
    t = Tables(6)
    for s in ["a1", "f6", "Sc4", "Cb2", "5c3<23", "3d3<", "c2+",
              "2a1>11", "4a4-121", "6d4+1113"]:
        assert str(parse_move(s)) == s
        assert t.action_to_ptn(t.ptn_to_action(s)) == s


def test_legacy_lut_prefix():
    """First entries of the generated 5x5 list match move_map.rs:51-201."""
    t = Tables(5)
    got = [t.action_to_ptn(a) for a in t.legacy_actions[:6]]
    assert got == ["a1", "Sa1", "Ca1", "a2", "Sa2", "Ca2"]
    # placements block (75 entries) is followed by a1's spreads:
    spreads = [t.action_to_ptn(a) for a in t.legacy_actions[75:83]]
    assert spreads == ["a1>", "2a1>", "2a1>11", "3a1>", "3a1>21",
                       "3a1>12", "3a1>111", "4a1>"]


_MOVE_MAP_RS = "/root/reference/alpha-tak/src/search/move_map.rs"


@pytest.mark.skipif(
    not __import__("os").path.exists(_MOVE_MAP_RS),
    reason="reference checkout not available",
)
def test_legacy_lut_full_parity():
    """ALL 1575 generated entries equal POSSIBLE_MOVES_IN_5S, in order.

    The reference hardcodes the table (move_map.rs:51-201); this repo
    generates it programmatically (actions.py).  The reference file is
    read at test time purely as a comparison oracle.
    """
    import re

    with open(_MOVE_MAP_RS) as f:
        src = f.read()
    body = src.split("POSSIBLE_MOVES_IN_5S", 1)[1]
    body = body.split("= [", 1)[1].split("];", 1)[0]
    ref = re.findall(r'"([^"]+)"', body)
    assert len(ref) == 1575

    t = Tables(5)
    got = [t.action_to_ptn(a) for a in t.legacy_actions]
    assert got == ref


def test_symmetries_are_permutations():
    t = Tables(6)
    ident = np.arange(t.num_actions)
    assert (t.sym_action[0] == ident).all()
    for i in range(8):
        assert np.array_equal(np.sort(t.sym_action[i]), ident)
    # mirror twice = identity; rot four times = identity
    rot = t.sym_action[1]
    r4 = ident
    for _ in range(4):
        r4 = rot[r4]
    assert np.array_equal(r4, ident)
    mir = t.sym_action[4]
    assert np.array_equal(mir[mir], ident)
