"""Evaluation bar graph from an analysis PTN (reference: graph.py:1-51).

Reads `{evaluation: +x.xxx}` comments out of an analysis file (the exact
regex contract the reference's graph.py uses) and renders the per-move
eval chart to graph.png.

    python tools/graph.py [analysis.ptn] [-o graph.png]
"""

import argparse
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BACKGROUND = "#404040"
EVALUATION = "#fb8b24"
WIDTH_PER_PLY = 0.2


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", nargs="?", default="analysis.ptn")
    parser.add_argument("-o", "--out", default="graph.png")
    args = parser.parse_args()

    with open(args.file, encoding="utf-8") as f:
        evals = np.array([
            float(match)
            for match in re.findall(r"{evaluation: ([+-]\d.\d*)}", f.read())
        ])
    plies = evals.size
    if plies == 0:
        raise SystemExit(f"no {{evaluation: ...}} comments in {args.file}")

    fig = plt.figure(figsize=(max(WIDTH_PER_PLY * plies, 4), 5),
                     tight_layout=True, dpi=200)
    ax = plt.axes()
    ax.set_facecolor(BACKGROUND)

    less = evals < 0
    black = less | np.roll(less, 1)
    white = ~less | np.roll(~less, 1)
    b_evals = evals.clip(max=0)
    w_evals = evals.clip(min=0)
    x = 1 + np.arange(plies) / 2

    ax.plot(x, np.zeros(plies), color="gray")
    ax.plot(x, evals, drawstyle="steps-post", color=EVALUATION)
    ax.fill_between(x, b_evals, step="post", where=black, color="black")
    ax.fill_between(x, w_evals, step="post", where=white, color="white")

    ax.set_title("Evaluation Graph")
    ax.set_xlabel("Move Number")
    ax.set_ylabel("Evaluation")
    ax.set_xbound(1, (plies + 1) / 2)
    ax.set_ybound(-1, 1)
    ax.set_xticks(x[::2])

    plt.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
