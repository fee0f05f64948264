#!/bin/sh
# Round-5 6x6 learning run: resumes the round-4 checkpoint
# (runs/train6_r4/_checkpoint) with the two diagnosed plateau fixes:
#   * 1000 games/generation — the reference's per-gen refresh
#     (train/src/self_play.rs:10) instead of round 4's 256, so the
#     400k replay window turns over ~4x faster and the candidate
#     trains on less incumbent-dominated data;
#   * --train-passes 2 — two shuffled passes over the buffer under one
#     Adam state per generation (Network.train passes=N).
# Search/gate shapes unchanged from round 4 (512 rollouts, wave 32,
# 64-game gate at 256 rollouts) so the Elo ladder stays comparable.
#
#   sh runs/train6_r5_launch.sh [extra trainer args]
#
# Logs append to runs/train6_r5.log; safe to interrupt + --resume.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=axon \
exec python -m tak_tpu.cli.train random \
    --size 6 --komi 2 \
    --games 1000 --workers 128 --rollouts 512 --wave 32 --k 32 \
    --pit-games 64 --pit-rollouts 256 \
    --train-passes 2 \
    --generations 60 \
    --workdir runs/train6_r4 --seed 6 --resume "$@"
