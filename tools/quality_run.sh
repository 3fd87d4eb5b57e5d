#!/bin/bash
# Self-contained quality run (round 4: VERDICT round-3 "do this" #1 —
# train the dual-stream model FOR REAL, launched in the round's first hour):
# diverse synthetic set -> VAE pre-train (warmup-cosine) -> long dual-stream
# training.  All stages resume from checkpoints, so the script is safe to
# re-run.
#
#   nohup bash tools/quality_run.sh /tmp/q4 60000 > /tmp/q4/driver.log 2>&1 &
#   echo $! > /tmp/q4/driver.pid        # used by tools/round4_finish.sh
#
# Afterwards:
#   python tools/eval_quality.py --config small \
#       --mesh-dir $ROOT/test/meshes --env-dir $ROOT/test/envs \
#       --ckpt $ROOT/run/checkpoints --vae-ckpt $ROOT/run/vae_checkpoints \
#       --n 32 --lpips --out QUALITY_r04.json
set -e
ROOT=${1:-/tmp/q4}
STEPS=${2:-60000}
VAE_STEPS=${3:-16000}
mkdir -p "$ROOT"
cd "$(dirname "$0")/.."

# data gen on CPU: it's tiny (32^2 envs), and holding the TPU lease here
# both delays training and risks a relay collision with any other client
# (observed: a concurrent backend init killed a TPU-side env gen with
# FAILED_PRECONDITION and set -e took the whole driver down)
if [ ! -f "$ROOT/data/.done" ]; then
  UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$ROOT/data" \
    --n-mesh 360 --n-env 48 --env-res 32 --env-min-res 8 --seed 0
  touch "$ROOT/data/.done"
fi
# held-out test set: SAME recipe/seed as rounds 2-3 (32 meshes / 8 envs,
# seed 99) so quality_baseline_random.json stays comparable
if [ ! -f "$ROOT/test/.done" ]; then
  UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$ROOT/test" \
    --n-mesh 32 --n-env 8 --env-res 32 --env-min-res 8 --seed 99
  touch "$ROOT/test/.done"
fi

# VAE first (no SD weights in a zero-egress environment); renders the
# shared 800-batch pool on the first pass.  Both training stages run under
# the relay-stall watchdog (tools/run_watched.sh): they resume from their
# checkpoints after a restart.  Round-4 VAE: cosine decay + more steps —
# the round-3 29.6dB recon capped every downstream map metric (VERDICT #6).
bash tools/run_watched.sh \
  "python tools/train_vae.py --workdir '$ROOT/run' --config small \
     --mesh-dir '$ROOT/data/meshes' --env-dir '$ROOT/data/envs' \
     --steps $VAE_STEPS --batch 16 --lr 1.5e-4 --lr-schedule cosine \
     --lr-warmup 500 --cache-batches 800 --cache-dir '$ROOT/pool'" \
  "$ROOT/run/vae_metrics.jsonl:$ROOT/pool:$ROOT/run/vae_checkpoints" 300 "$ROOT/watchdog.pid"

bash tools/run_watched.sh \
  "python tools/train.py --workdir '$ROOT/run' --config small \
     --steps $STEPS --batch-per-device 16 --lr 1.4e-4 \
     --lr-schedule cosine --lr-warmup 1000 \
     --mesh-dir '$ROOT/data/meshes' --env-dir '$ROOT/data/envs' \
     --vae-ckpt '$ROOT/run/vae_checkpoints' \
     --cache-batches 800 --cache-dir '$ROOT/pool'" \
  "$ROOT/run/metrics.jsonl:$ROOT/pool:$ROOT/run/checkpoints" 300 "$ROOT/watchdog.pid"
echo "QUALITY RUN COMPLETE"
