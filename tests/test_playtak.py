"""playtak protocol + bot loop with a scripted fake transport (offline)."""

import socket

import jax.numpy as jnp
import pytest

from tak_tpu.actions import Move, parse_move
from tak_tpu.engine.core import get_engine
from tak_tpu.playtak.bot import BotConfig, PlaytakBot
from tak_tpu.playtak.protocol import (
    PlaytakProtocol,
    move_to_wire,
    wire_to_move,
)


def test_wire_move_roundtrip():
    for ptn, wire in [
        ("a1", "Game#7 P A1"),
        ("Sc4", "Game#7 P C4 W"),
        ("Cb2", "Game#7 P B2 C"),
        ("3c3>21", "Game#7 M C3 E3 2 1"),
        ("c3+", "Game#7 M C3 C4 1"),
        ("5c3<23", "Game#7 M C3 A3 2 3"),
    ]:
        m = parse_move(ptn)
        assert move_to_wire(7, m) == wire
        back = wire_to_move(wire.split()[1:])
        assert str(back) == ptn


def test_protocol_events():
    p = PlaytakProtocol()
    assert p.feed("Welcome takbot!") == ("login_ok", "takbot")
    ev = p.feed("Game Start 42 6 alice vs bob white 600")
    assert ev[0] == "game_start"
    info = ev[1]
    assert (info.number, info.size, info.white, info.black, info.my_color) \
        == (42, 6, "alice", "bob", 0)
    ev = p.feed("Game#42 P A1")
    assert ev[0] == "move" and str(ev[2]) == "a1"
    ev = p.feed("Game#42 M C3 C5 1 2")
    assert ev[0] == "move" and str(ev[2]) == "3c3+12"
    assert p.feed("Game#42 Over R-0") == ("game_over", 42, "R-0")
    assert p.feed("Game#42 Time 400 300") == ("time", 42, 400, 300)
    assert p.feed("Shout hello") is None


class FakeTransport:
    """Feeds scripted server lines; records client sends."""

    def __init__(self, lines):
        self.lines = list(lines)
        self.sent = []

    def send(self, line):
        self.sent.append(line)

    def readline(self):
        if not self.lines:
            return ""
        item = self.lines.pop(0)
        if item is None:
            raise socket.timeout()
        return item


def test_bot_plays_scripted_game(tmp_path):
    engine = get_engine(3)
    A = engine.num_actions

    def dummy_eval(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    cfg = BotConfig(size=3, komi=0, time_to_think=0.0, wave_size=4,
                    workdir=str(tmp_path))
    bot = PlaytakBot(engine, dummy_eval, None, cfg)

    # bot plays white: forced a1 first; opponent replies; bot answers; then
    # the server ends the game.
    transport = FakeTransport([
        "Welcome tester!",
        "Game Start 9 3 tester vs foe white 600",
        "Game#9 P C3",
        None,  # one ponder tick
        "Game#9 Over 0-R",
    ])
    bot.run(transport, max_games=1)
    assert transport.sent[0] == "Login Guest"
    assert transport.sent[1].startswith("Seek 3 600 10 W")
    assert transport.sent[2] == "Game#9 P A1"
    assert transport.sent[3].startswith("Game#9 ")  # bot's reply move
    # analysis PTN written
    games = list((tmp_path / "_playtak_games").iterdir())
    assert len(games) == 1 and "tester_vs_foe" in games[0].name
    # examples appended with the black-win result
    data = list((tmp_path / "_examples").iterdir())
    assert len(data) == 1
