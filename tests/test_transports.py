"""REAL-transport smoke tests: the playtak bot through an actual TCP
socket (loopback scripted server) and the TEI server through a process
pipe.

The offline tests (test_playtak.py) script a FakeTransport / in-process
server; these exercise the production wire paths themselves —
`playtak.protocol.TcpTransport` (playtak.rs:58-99 behavior; the live
playtak.com server is unreachable from this environment, so the scripted
loopback server stands in) and `python -m tak_tpu.cli.tei` over stdio
(tei/src/main.rs:64-158).
"""

import os
import socket
import subprocess
import sys
import threading

import jax.numpy as jnp

from tak_tpu.engine.core import get_engine
from tak_tpu.playtak.bot import BotConfig, PlaytakBot
from tak_tpu.playtak.protocol import TcpTransport

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class ScriptedTakServer(threading.Thread):
    """Minimal playtak.com stand-in for ONE scripted guest game."""

    def __init__(self):
        super().__init__(daemon=True)
        self.listener = socket.create_server(("127.0.0.1", 0))
        self.port = self.listener.getsockname()[1]
        self.received = []
        self.error = None

    def _expect(self, rfile, prefix):
        line = rfile.readline().strip()
        self.received.append(line)
        if not line.startswith(prefix):
            raise AssertionError(f"expected {prefix!r}, got {line!r}")
        return line

    def run(self):
        try:
            conn, _ = self.listener.accept()
            conn.settimeout(60)
            rfile = conn.makefile("r", encoding="utf-8", newline="\n")
            send = lambda s: conn.sendall((s + "\n").encode())

            self._expect(rfile, "Login Guest")
            send("Welcome tester!")
            self._expect(rfile, "Seek 3 600 10 W")
            send("Game Start 9 3 tester vs foe white 600")
            self._expect(rfile, "Game#9 P A1")  # forced opening placement
            send("Game#9 P C3")                 # opponent reply
            self._expect(rfile, "Game#9 ")      # bot's second move
            send("Game#9 Over 0-R")
            conn.close()
        except Exception as e:  # surfaced by the main thread's assert
            self.error = e
        finally:
            self.listener.close()


def test_bot_over_real_tcp_socket(tmp_path):
    """PlaytakBot drives a full scripted game through TcpTransport —
    the actual blocking socket + line framing used against playtak.com,
    including the readline-timeout ponder path."""
    engine = get_engine(3)
    A = engine.num_actions

    def dummy_eval(params, states):
        b = states.ply.shape[0]
        return jnp.ones((b, A), jnp.float32), jnp.zeros(b, jnp.float32)

    server = ScriptedTakServer()
    server.start()

    cfg = BotConfig(size=3, komi=0, time_to_think=0.0, wave_size=4,
                    workdir=str(tmp_path))
    bot = PlaytakBot(engine, dummy_eval, None, cfg)
    # short socket timeout so readline times out while the server waits
    # on our moves -> the ponder branch runs over the real transport too
    transport = TcpTransport(host="127.0.0.1", port=server.port,
                             timeout=0.25)
    try:
        bot.run(transport, max_games=1, log=lambda m: None)
    finally:
        transport.close()
    server.join(timeout=30)
    assert not server.is_alive(), "scripted server did not finish"
    assert server.error is None, server.error
    assert server.received[0] == "Login Guest"
    assert server.received[2] == "Game#9 P A1"
    # game artifacts written exactly as in the fake-transport test
    games = list((tmp_path / "_playtak_games").iterdir())
    assert len(games) == 1 and "tester_vs_foe" in games[0].name


def test_tei_session_over_pipe():
    """Full TEI session against `python -m tak_tpu.cli.tei` through a
    real process pipe: handshake -> position -> go -> bestmove -> quit."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "tak_tpu.cli.tei", "random", "--size", "3",
         "--cpu", "-b", "8"],
        cwd=REPO, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    script = (
        "tei\n"
        "isready\n"
        "teinewgame 3\n"
        "position startpos moves a1 c3\n"
        "go wtime 2000 btime 2000 winc 100 binc 100\n"
        "quit\n"
    )
    try:
        out, err = proc.communicate(script, timeout=560)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    assert proc.returncode == 0, err[-2000:]
    lines = out.splitlines()
    assert any(l.startswith("id name") for l in lines), out
    assert "teiok" in lines, out
    assert "readyok" in lines, out
    info = [l for l in lines if l.startswith("info")]
    assert info and any("nps" in l for l in info), out
    best = [l for l in lines if l.startswith("bestmove ")]
    assert len(best) == 1, out
    # the bestmove must be a legal move in the position after a1 c3
    import tak_tpu

    g = tak_tpu.Game(3)
    g.play("a1")
    g.play("c3")
    assert best[0].split()[1] in [str(m) for m in g.possible_moves()], out
