#!/bin/sh
# Round-4 6x6 learning run (the reference's flagship board size:
# train/src/main.rs:43 hardwires Net6 16x128).  Reduced scale vs the
# reference's 1000 games x 10k rollouts, same shape: generational
# self-play -> train -> 0.55 gate at 64 paired-opening pit games.
#
#   sh runs/train6_r4_launch.sh [extra trainer args]
#
# Logs to runs/train6_r4.log; resume with --resume after interruption.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
exec python -m tak_tpu.cli.train random \
    --size 6 --komi 2 \
    --games 256 --workers 128 --rollouts 512 --wave 32 --k 32 \
    --pit-games 64 --pit-rollouts 256 \
    --generations 40 \
    --workdir runs/train6_r4 --seed 6 "$@"
