"""Render an evaluation chart from an analysis PTN.

Consumes the `{evaluation: +x.xxx}` comments that tak_tpu's Analysis
writer (and the reference framework) embed in PTN output — the same
comment contract the reference's plotting script reads (graph.py:18-20)
— and draws a per-ply advantage chart.  Unlike the reference's
step-line rendering, each ply is drawn as a bar from zero, colored by
whichever side the network thinks is ahead, with optional blunder/great
move marks pulled from the PTN's `?`/`!` annotations.

    python tools/graph.py [analysis.ptn] [-o graph.png] [--csv evals.csv]
"""

from __future__ import annotations

import argparse
import csv
import re
import sys
from dataclasses import dataclass

EVAL_COMMENT = re.compile(r"\{evaluation: ([+-]?\d\.\d*)\}")
MARKED_MOVE = re.compile(r"(\S+?)(\?\?|\?|!!|!)\s")

INK = "#e8e4dc"
PANEL = "#2b2b33"
WHITE_BAR = "#f2f0ea"
BLACK_BAR = "#17171c"
TREND = "#e08a1e"
GRID = "#55555f"


@dataclass
class GameEvals:
    """Per-ply evaluations (white's perspective, in [-1, 1])."""

    values: list[float]
    marks: list[tuple[int, str]]  # (ply index, "?"/"??"/"!"/"!!")

    @property
    def plies(self) -> int:
        return len(self.values)


def parse_analysis(text: str) -> GameEvals:
    values = [float(v) for v in EVAL_COMMENT.findall(text)]
    # Associate annotation marks with their ply ordinal.  Marks appear on
    # the move token itself (e.g. "c3?? {evaluation: -0.512}"), so count
    # eval comments seen before each mark to recover the ply index.
    marks: list[tuple[int, str]] = []
    seen = 0
    for token in re.finditer(r"\{evaluation:[^}]*\}|(\S+?)(\?\?|!!|\?|!)(?=\s|$)", text):
        if token.group(0).startswith("{"):
            seen += 1
        elif token.group(2):
            marks.append((seen, token.group(2)))
    return GameEvals(values, marks)


def write_csv(game: GameEvals, path: str) -> None:
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["ply", "move_number", "side", "evaluation"])
        for i, v in enumerate(game.values):
            writer.writerow([i + 1, 1 + i // 2, "WB"[i % 2], f"{v:+.3f}"])


def render(game: GameEvals, out: str, title: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    vals = np.asarray(game.values)
    n = vals.size
    move_no = 1.0 + np.arange(n) / 2.0  # ply -> move number axis

    fig, ax = plt.subplots(
        figsize=(max(4.0, 0.22 * n), 4.2), dpi=180, layout="constrained"
    )
    fig.patch.set_facecolor(PANEL)
    ax.set_facecolor(PANEL)

    # One bar per ply from the zero line; the bar takes the color of the
    # side that is ahead so the chart reads like a momentum strip.
    ahead_white = vals >= 0
    ax.bar(
        move_no,
        vals,
        width=0.5,
        align="edge",
        color=np.where(ahead_white, WHITE_BAR, BLACK_BAR),
        edgecolor=GRID,
        linewidth=0.4,
    )
    ax.step(move_no, vals, where="post", color=TREND, linewidth=1.2, alpha=0.9)
    ax.axhline(0.0, color=GRID, linewidth=0.8)

    for ply, mark in game.marks:
        if 0 < ply <= n:
            y = vals[ply - 1]
            ax.annotate(
                mark,
                (move_no[ply - 1] + 0.25, y),
                color=TREND if "!" in mark else "#d04a4a",
                ha="center",
                va="bottom" if y >= 0 else "top",
                fontsize=8,
                fontweight="bold",
            )

    ax.set_title(title, color=INK)
    ax.set_xlabel("Move number", color=INK)
    ax.set_ylabel("Evaluation (white +)", color=INK)
    ax.set_ylim(-1.05, 1.05)
    ax.set_xlim(1, 1 + n / 2)
    ax.tick_params(colors=INK)
    for spine in ax.spines.values():
        spine.set_color(GRID)
    ax.grid(axis="y", color=GRID, linewidth=0.3, alpha=0.6)

    fig.savefig(out)
    plt.close(fig)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Plot the evaluation trace embedded in an analysis PTN."
    )
    parser.add_argument("file", nargs="?", default="analysis.ptn")
    parser.add_argument("-o", "--out", default="graph.png")
    parser.add_argument("--csv", help="also dump evals to this CSV file")
    parser.add_argument("--title", default="Evaluation")
    args = parser.parse_args(argv)

    with open(args.file, encoding="utf-8") as f:
        game = parse_analysis(f.read())
    if not game.plies:
        print(f"no {{evaluation: ...}} comments found in {args.file}", file=sys.stderr)
        return 1

    if args.csv:
        write_csv(game, args.csv)
        print(f"wrote {args.csv}")
    render(game, args.out, args.title)
    print(f"wrote {args.out} ({game.plies} plies, {len(game.marks)} marked moves)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
