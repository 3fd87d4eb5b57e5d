#!/bin/bash
# round4b_finish2.sh <deadline_epoch_s> [root=/tmp/q5] [hardstop_epoch_s]
#
# Re-armed end-of-round driver for the round-4b scene-bank run (replaces
# round4b_finish.sh with a longer artifact window): at the deadline (or
# when the run completes), stop training, wait out the relay lease, then
# produce artifacts in priority order, COMMITTING AFTER EACH ONE — every
# artifact gated on non-empty parseable JSON (round-3 post-mortem rules).
#   1. artifacts/r04b/*.npz + metrics tail — durable trained state
#   2. QUALITY_r04b.json (+grids) — held-out eval of the RESTORED checkpoint
#   3. TRAIN512_r04.json — flagship 512^2 train step, adafactor (AdamW
#      state is 20.9GB > 16GB HBM: structurally impossible single-chip)
#   4. RENDERSTEP512_r04.json — fused render-in-step flagship, adafactor
#   5. QUALITY_r04b_train_set.json — same eval on TRAINING meshes: the
#      generalization-gap control for the fresh-scenes fix
#   6. QUALITY_r04b_trajectory.json — eval at preserved 10k snapshots
#   7. bench.py preflight — verify the driver's round-end bench will work
set -u
DEADLINE=${1:?deadline epoch}
ROOT=${2:-/tmp/q5}
HARDSTOP=${3:-$((DEADLINE + 6600))}
cd /root/repo
exec >> "$ROOT/finish.log" 2>&1

json_ok() { [ -s "$1" ] && python -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null; }

commit_json() {
  if json_ok "$1"; then
    git add "$1" && git commit -m "$2" && echo "=== committed $1"
  else
    echo "=== NOT committing $1 (missing/empty/unparseable)"
    rm -f "$1"
  fi
}

hardstop_check() {
  if [ "$(( $(date +%s) + ${2:-0} ))" -gt "$HARDSTOP" ]; then
    echo "=== $(date -u) HARDSTOP would be breached by '$1' (+${2:-0}s); skipping"
    return 1
  fi
  return 0
}

probe_if_timeout() {
  if [ "$1" -ge 124 ]; then
    echo "=== $(date -u) previous step rc=$1 (killed); patient probe to clear the lease"
    timeout 1200 python -c 'import jax.numpy as jnp; print(jnp.ones((8,8)).sum())' >/dev/null 2>&1
    echo "=== $(date -u) probe rc=$?"
  fi
}

echo "=== finish2 armed; deadline $(date -ud @"$DEADLINE"); hardstop $(date -ud @"$HARDSTOP")"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 30
  [ -f "$ROOT/finish.started" ] && exit 0
  grep -q "QUALITY RUN COMPLETE" "$ROOT/driver.log" 2>/dev/null && break
done
touch "$ROOT/finish.started"
echo "=== $(date -u) deadline/complete; stopping training"

[ -f "$ROOT/driver.pid" ] && kill "$(cat "$ROOT/driver.pid")" 2>/dev/null
[ -f "$ROOT/watchdog.pid" ] && kill "$(cat "$ROOT/watchdog.pid")" 2>/dev/null
if [ -f "$ROOT/watchdog.pid.child" ]; then
  CPID=$(cat "$ROOT/watchdog.pid.child")
  kill -- "-$CPID" 2>/dev/null
  sleep 20
  kill -9 -- "-$CPID" 2>/dev/null
fi

echo "=== $(date -u) waiting out the relay lease (patient probe)"
timeout 1500 python -c 'import jax.numpy as jnp; print(jnp.ones((8,8)).sum())'
echo "=== $(date -u) probe done rc=$?"

# ---- 1. durable trained state --------------------------------------------
mkdir -p artifacts/r04b
UNIRENDER_PLATFORM=cpu timeout 900 python tools/export_params.py \
  --ckpt "$ROOT/run/checkpoints" --out artifacts/r04b/dual_small.npz
tail -200 "$ROOT/run/metrics.jsonl" > artifacts/r04b/metrics_tail.jsonl 2>/dev/null
if [ -s artifacts/r04b/dual_small.npz ]; then
  git add artifacts/r04b && git commit -m "Round-4b trained weights (params-only f16 npz): scene-bank fresh-scenes run, warm-started from the step-54k round-4 weights (VAE unchanged: artifacts/r04/vae_small.npz)"
  echo "=== committed artifacts/r04b"
fi

# ---- 2. held-out quality eval ---------------------------------------------
if hardstop_check "QUALITY_r04b" 3000; then
  timeout 3000 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 32 --steps 20 --lpips --dump-images artifacts/r04b/grids \
    --out QUALITY_r04b.json
  RC=$?; echo "=== $(date -u) eval rc=$RC"; probe_if_timeout $RC
  STEP=$(python -c "import json; print(json.load(open('QUALITY_r04b.json'))['checkpoint_step'])" 2>/dev/null || echo "?")
  commit_json QUALITY_r04b.json "QUALITY_r04b: held-out eval after scene-bank FRESH-scenes training (restored step $STEP, n=32; warm-started from the round-4 step-54k weights whose held-out forward PSNR had degraded to 7.3 by pool overfitting)"
  if ls artifacts/r04b/grids/*.png >/dev/null 2>&1; then
    git add artifacts/r04b/grids && git commit -m "Visual eval grids for QUALITY_r04b (GT row over prediction row per held-out object)" && echo "=== committed eval grids"
  fi
fi

# ---- 2b. reference-protocol ensemble-of-5 inverse eval ---------------------
if hardstop_check "QUALITY_r04b_ens5" 2400; then
  timeout 2400 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 32 --steps 20 --ensemble 5 --out QUALITY_r04b_ens5.json
  RC=$?; probe_if_timeout $RC
  commit_json QUALITY_r04b_ens5.json "QUALITY_r04b ensemble-of-5: the reference's inverse eval protocol (test_real.py:539-564 — 5 runs at 20 UniPC steps, averaged) on the held-out set; the ensemble is folded into the batch dim as one jitted scan (pipelines._inverse)"
fi

# ---- 3. flagship 512^2 train step (adafactor) ------------------------------
# batch ladder 4 -> 2 -> 1: even batch 1 proves the reference's regime
# (512^2 flagship training) FITS and STEPS on one 16GB v5e
for BS in 4 2 1; do
  hardstop_check "TRAIN512_r04 b$BS" 2400 || break
  timeout 2400 python tools/bench_train.py --batch "$BS" --iters 2 \
    --optimizer adafactor | tail -1 > TRAIN512_r04.json
  RC=$?; probe_if_timeout $RC
  json_ok TRAIN512_r04.json && break
  echo "=== TRAIN512 batch $BS failed"
done
commit_json TRAIN512_r04.json "TRAIN512_r04: flagship 512^2 dual-schedule train step on the v5e with ADAFACTOR (AdamW f32 state is 20.9GB for the 1.74B-param flagship, structurally > one 16GB chip; factored second moments are the single-chip-trainable configuration — multi-chip AdamW runs via FSDP, tests/test_parallel_train.py)"

# ---- 4. fused render-in-step flagship (adafactor) ---------------------------
for BS in 4 2 1; do
  hardstop_check "RENDERSTEP512_r04 b$BS" 2400 || break
  timeout 2400 python tools/bench_train.py --batch "$BS" --iters 2 \
    --render-in-step --optimizer adafactor | tail -1 > RENDERSTEP512_r04.json
  RC=$?; probe_if_timeout $RC
  json_ok RENDERSTEP512_r04.json && break
  echo "=== RENDERSTEP512 batch $BS failed"
done
commit_json RENDERSTEP512_r04.json "RENDERSTEP512_r04: FUSED render-in-step flagship 512^2 train step (rasterize+shade SSAA2 + VAE encodes + dual-schedule loss + adafactor as ONE XLA program — the reference's in-loop render regime, train/train.py:184-439)"

# ---- 5. train-set control: the generalization gap -------------------------
if hardstop_check "QUALITY_r04b_train_set" 1800; then
  timeout 1800 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/all_meshes" --env-dir "$ROOT/all_envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 16 --steps 20 --out QUALITY_r04b_train_set.json
  RC=$?; probe_if_timeout $RC
  commit_json QUALITY_r04b_train_set.json "QUALITY_r04b train-set control (n=16, TRAINING meshes): held-out minus train-set delta measures the generalization gap after the fresh-scenes fix"
fi

# ---- 6. trajectory over preserved snapshots --------------------------------
SNAPS=$(ls -d "$ROOT"/snapshots/checkpoint-* 2>/dev/null \
        | sort -t- -k2 -n | awk 'NR==1 || NR%2==1' | tail -3)
rm -rf "$ROOT/traj"; : > /tmp/traj_parts_b.txt
for S in $SNAPS; do
  hardstop_check "trajectory point $S" 1200 || break
  N=$(basename "$S" | cut -d- -f2)
  mkdir -p "$ROOT/traj/$N"
  cp -r "$S" "$ROOT/traj/$N/"
  timeout 1200 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/traj/$N" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 8 --steps 10 --out "/tmp/traj_b_$N.json" \
    && echo "/tmp/traj_b_$N.json" >> /tmp/traj_parts_b.txt
  RC=$?; probe_if_timeout $RC
done
python - <<'PYEOF'
import json
parts = [p.strip() for p in open("/tmp/traj_parts_b.txt") if p.strip()]
rows = []
for p in parts:
    d = json.load(open(p))
    rows.append({"checkpoint_step": d.get("checkpoint_step"),
                 "psnr_forward_render": d.get("psnr_forward_render"),
                 "psnr_maps": d.get("psnr_maps"),
                 "normal_angle": d.get("normal_angle"),
                 "metal_rough_mae": d.get("metal_rough_mae")})
if rows:
    json.dump({"n_objects": 8, "unipc_steps": 10, "trajectory": rows},
              open("QUALITY_r04b_trajectory.json", "w"), indent=1)
PYEOF
commit_json QUALITY_r04b_trajectory.json "QUALITY_r04b trajectory: held-out eval at preserved 10k snapshots of the fresh-scenes run (n=8, 10 UniPC steps)"

# ---- 7. bench.py preflight (the driver runs this at round end) --------------
if hardstop_check "bench preflight" 1800; then
  timeout 1800 python bench.py | tail -1 > /tmp/bench_preflight_r04b.json
  RC=$?; probe_if_timeout $RC
  echo "=== bench preflight rc=$RC: $(cat /tmp/bench_preflight_r04b.json)"
fi

echo "=== $(date -u) finish2 script complete"
