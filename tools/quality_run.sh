#!/bin/bash
# Self-contained round-3 quality run (VERDICT round-2 "do this" #1):
# diverse synthetic set -> VAE pre-train -> long dual-stream training.
# All stages resume from checkpoints, so the script is safe to re-run.
#
#   nohup bash tools/quality_run.sh /tmp/q3 > /tmp/q3_driver.log 2>&1 &
#
# Afterwards:
#   python tools/eval_quality.py --config small \
#       --mesh-dir $ROOT/test/meshes --env-dir $ROOT/test/envs \
#       --ckpt $ROOT/run/checkpoints --vae-ckpt $ROOT/run/vae_checkpoints \
#       --n 32 --fid --lpips --out QUALITY_r03.json
set -e
ROOT=${1:-/tmp/q3}
STEPS=${2:-150000}
mkdir -p "$ROOT"
cd "$(dirname "$0")/.."

# data gen on CPU: it's tiny (32^2 envs), and holding the TPU lease here
# both delays training and risks a relay collision with any other client
# (observed: a concurrent backend init killed a TPU-side env gen with
# FAILED_PRECONDITION and set -e took the whole driver down)
if [ ! -f "$ROOT/data/.done" ]; then
  UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$ROOT/data" \
    --n-mesh 240 --n-env 32 --env-res 32 --env-min-res 8 --seed 0
  touch "$ROOT/data/.done"
fi
if [ ! -f "$ROOT/test/.done" ]; then
  UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$ROOT/test" \
    --n-mesh 32 --n-env 8 --env-res 32 --env-min-res 8 --seed 99
  touch "$ROOT/test/.done"
fi

# VAE first (no SD weights in a zero-egress environment); renders the
# shared 640-batch pool on the first pass.  Both training stages run under
# the relay-stall watchdog (tools/run_watched.sh): they resume from their
# checkpoints after a restart.
bash tools/run_watched.sh \
  "python tools/train_vae.py --workdir '$ROOT/run' --config small \
     --mesh-dir '$ROOT/data/meshes' --env-dir '$ROOT/data/envs' \
     --steps 8000 --batch 16 --cache-batches 640 --cache-dir '$ROOT/pool'" \
  "$ROOT/run/vae_metrics.jsonl:$ROOT/pool:$ROOT/run/vae_checkpoints" 300 "$ROOT/watchdog.pid"

bash tools/run_watched.sh \
  "python tools/train.py --workdir '$ROOT/run' --config small \
     --mesh-dir '$ROOT/data/meshes' --env-dir '$ROOT/data/envs' \
     --steps $STEPS --batch-per-device 16 --lr 1.4e-4 \
     --lr-schedule cosine --lr-warmup 1000 \
     --vae-ckpt '$ROOT/run/vae_checkpoints' \
     --cache-batches 640 --cache-dir '$ROOT/pool'" \
  "$ROOT/run/metrics.jsonl:$ROOT/pool:$ROOT/run/checkpoints" 300 "$ROOT/watchdog.pid"
echo "QUALITY RUN COMPLETE"
