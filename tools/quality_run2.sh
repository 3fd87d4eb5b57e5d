#!/bin/bash
# Round-4b quality run: scene-bank FRESH-scenes training (data/scene_bank),
# warm-started from the round-4 step-54k weights (artifacts/r04).  The
# round-4 finite-pool run overfit its image stream (held-out forward PSNR
# fell 11.2 -> 8.0 between 10k and 50k steps while inverse maps improved);
# this run draws a new random batch inside the jitted step from a
# 1440-mesh / 96-env device-resident bank, with on-device augmentations.
#
#   nohup bash tools/quality_run2.sh /tmp/q5 90000 > /tmp/q5/driver.log 2>&1 &
#   echo $! > /tmp/q5/driver.pid
#   nohup bash tools/snapshot_loop.sh /tmp/q5 > /tmp/q5/snapshot.log 2>&1 &
#   nohup bash tools/round4b_finish.sh <deadline> /tmp/q5 <hardstop> &
#
# Expects (prepared by the session driver):
#   $ROOT/all_meshes, $ROOT/all_envs — union synthetic set (seeds 0+1)
#   $ROOT/test                       — held-out set (seed 99, rounds 2-4)
#   artifacts/r04/dual_small.npz, artifacts/r04/vae_small.npz
set -u
ROOT=${1:-/tmp/q5}
STEPS=${2:-90000}
cd "$(dirname "$0")/.."
mkdir -p "$ROOT"

bash tools/run_watched.sh \
  "python tools/train.py --workdir '$ROOT/run' --config small \
     --steps $STEPS --batch-per-device 16 --lr 1e-4 \
     --lr-schedule cosine --lr-warmup 1000 --lr-decay-steps $STEPS \
     --scene-bank --mesh-dir '$ROOT/all_meshes' --env-dir '$ROOT/all_envs' \
     --vae-ckpt artifacts/r04/vae_small.npz \
     --init-params artifacts/r04/dual_small.npz" \
  "$ROOT/run/metrics.jsonl:$ROOT/run/checkpoints" 300 "$ROOT/watchdog.pid"
echo "QUALITY RUN COMPLETE"
