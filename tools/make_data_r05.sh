#!/bin/bash
# Round-5 data regen (fresh VM): union train set (seeds 0+1, 720 meshes /
# 48 envs each -> 1440/96 as trained in round 4b) + held-out test (seed 99,
# same recipe as rounds 2-4 so quality_baseline_random.json stays
# comparable).  CPU only — never touches the chip.
set -eu
ROOT=${1:-/tmp/q5}
cd "$(dirname "$0")/.."
mkdir -p "$ROOT"

for seed in 0 1; do
  d="$ROOT/data_s$seed"
  if [ ! -f "$d/.done" ]; then
    UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$d" \
      --n-mesh 720 --n-env 48 --env-res 32 --env-min-res 8 --seed $seed
    touch "$d/.done"
  fi
done
if [ ! -f "$ROOT/test/.done" ]; then
  UNIRENDER_PLATFORM=cpu python tools/make_synthetic_data.py --out "$ROOT/test" \
    --n-mesh 32 --n-env 8 --env-res 32 --env-min-res 8 --seed 99
  touch "$ROOT/test/.done"
fi

# union via symlinks, seed-prefixed to avoid name collisions
mkdir -p "$ROOT/all_meshes" "$ROOT/all_envs"
for seed in 0 1; do
  for f in "$ROOT/data_s$seed/meshes"/*.npz; do
    ln -sf "$f" "$ROOT/all_meshes/s${seed}_$(basename "$f")"
  done
  for d in "$ROOT/data_s$seed/envs"/*/; do
    ln -sfn "${d%/}" "$ROOT/all_envs/s${seed}_$(basename "$d")"
  done
done
echo "DATA READY: $(ls "$ROOT/all_meshes" | wc -l) meshes, $(ls "$ROOT/all_envs" | wc -l) envs, $(ls "$ROOT/test/meshes" | wc -l) test meshes"
