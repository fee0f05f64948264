"""playtak.com bot CLI — capability mirror of the reference `playtak` binary.

    python -m tak_tpu.cli.playtak_cli MODEL [USERNAME PASSWORD] [options]

Connects to playtak.com (or --host/--port), seeks 6x6 komi-2 games with
alternating colors, and plays with the trained network (playtak/src/).
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(prog="tak-playtak", description=__doc__)
    p.add_argument("model_path")
    p.add_argument("username", nargs="?", default=None)
    p.add_argument("password", nargs="?", default=None)
    p.add_argument("--size", type=int, default=6)
    p.add_argument("--komi", type=int, default=2)
    p.add_argument("-b", "--start-as-black", action="store_true")
    p.add_argument("--initial-time", type=int, default=600)
    p.add_argument("--increment", type=int, default=10)
    p.add_argument("-t", "--time-to-think", type=float, default=10)
    p.add_argument("--host", default="playtak.com")
    p.add_argument("--port", type=int, default=10000)
    p.add_argument("--max-games", type=int, default=None)
    p.add_argument("--log-file", default="playtak.log",
                   help="append bot activity here (playtak/src/main.rs:39)")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..utils.device import setup_performance_defaults

    setup_performance_defaults()

    from ..engine.core import get_engine
    from ..model.network import Network
    from ..playtak.bot import BotConfig, PlaytakBot
    from ..playtak.protocol import TcpTransport

    engine = get_engine(args.size)
    network = Network(engine)
    if args.model_path == "random":
        variables = network.init_variables(0)
    else:
        variables = network.load(args.model_path)
    eval_fn = lambda p, s: network.policy_eval_states(p, s)

    bot = PlaytakBot(engine, eval_fn, variables, BotConfig(
        size=args.size, komi=args.komi,
        time_to_think=args.time_to_think,
        initial_time=args.initial_time, increment=args.increment,
        start_as_black=args.start_as_black,
    ))
    import time as _time

    logf = open(args.log_file, "a") if args.log_file else None

    def log(msg):
        line = f"[{_time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line)
        if logf:
            logf.write(line + "\n")
            logf.flush()

    transport = TcpTransport(args.host, args.port, timeout=0.2)
    try:
        bot.run(transport, args.username, args.password, log=log,
                max_games=args.max_games)
    finally:
        transport.close()
        if logf:
            logf.close()


if __name__ == "__main__":
    main()
