#!/bin/bash
# round5_finish.sh <deadline_epoch_s> [root=/tmp/q5] [hardstop_epoch_s]
#
# Round-5 end-of-round driver for the scene-bank fresh-scenes run that
# round 4 launched (tools/quality_run2.sh: 90k steps, warm-started from
# the round-4 step-54k weights).  Round 5 inherited the run live at ~38k
# steps and extended the deadline so it completes its full 90k schedule.
# At the deadline (or natural completion), stop training, wait out the
# relay lease, then produce artifacts in priority order, COMMITTING AFTER
# EACH ONE — every artifact gated on non-empty parseable JSON (round-3
# post-mortem rules).
#   1. artifacts/r05/*.npz + metrics tail — durable trained state
#   2. QUALITY_r05.json (+grids) — held-out eval of the RESTORED checkpoint
#   3. QUALITY_r05_ens5.json — reference-protocol ensemble-of-5 inverse eval
#   4. ATTN_AB_r05.json — unet_flash_attention (ops/attn_kernel.py) A/B
#   5. TRAIN512_r05.json — flagship 512^2 train step, adafactor
#   6. RENDERSTEP512_r05.json — fused render-in-step flagship, adafactor
#   7. QUALITY_r05_train_set.json — train-set control (generalization gap)
#   8. QUALITY_r05_trajectory.json — eval at preserved 10k snapshots
#   9. bench.py preflight
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

echo "=== round5 finish armed; deadline $(date -ud @"$DEADLINE"); hardstop $(date -ud @"$HARDSTOP")"
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
mkdir -p artifacts/r05
UNIRENDER_PLATFORM=cpu timeout 900 python tools/export_params.py \
  --ckpt "$ROOT/run/checkpoints" --out artifacts/r05/dual_small.npz
tail -200 "$ROOT/run/metrics.jsonl" > artifacts/r05/metrics_tail.jsonl 2>/dev/null
if [ -s artifacts/r05/dual_small.npz ]; then
  git add artifacts/r05 && git commit -m "Round-5 trained weights (params-only f16 npz): scene-bank fresh-scenes run to completion — 90k-step cosine schedule, warm-started from the round-4 step-54k weights (VAE unchanged: artifacts/r04/vae_small.npz)"
  echo "=== committed artifacts/r05"
fi

# ---- 2. held-out quality eval ---------------------------------------------
if hardstop_check "QUALITY_r05" 3000; then
  timeout 3000 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 32 --steps 20 --lpips --dump-images artifacts/r05/grids \
    --out QUALITY_r05.json
  RC=$?; echo "=== $(date -u) eval rc=$RC"; probe_if_timeout $RC
  STEP=$(python -c "import json; print(json.load(open('QUALITY_r05.json'))['checkpoint_step'])" 2>/dev/null || echo "?")
  commit_json QUALITY_r05.json "QUALITY_r05: held-out eval of the completed scene-bank fresh-scenes run (restored step $STEP, n=32, 20 UniPC steps, LPIPS; FID omitted — uncalibrated without ported Inception weights)"
  if ls artifacts/r05/grids/*.png >/dev/null 2>&1; then
    git add artifacts/r05/grids && git commit -m "Visual eval grids for QUALITY_r05 (GT row over prediction row per held-out object)" && echo "=== committed eval grids"
  fi
fi

# ---- 3. reference-protocol ensemble-of-5 inverse eval ---------------------
if hardstop_check "QUALITY_r05_ens5" 2400; then
  timeout 2400 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 32 --steps 20 --ensemble 5 --out QUALITY_r05_ens5.json
  RC=$?; probe_if_timeout $RC
  commit_json QUALITY_r05_ens5.json "QUALITY_r05 ensemble-of-5: the reference's inverse eval protocol (test_real.py:539-564 — 5 runs at 20 UniPC steps, averaged) on the held-out set"
fi

# ---- 4. attention kernel A/B: the new specialized unet_flash kernel --------
if hardstop_check "ATTN_AB_r05" 1500; then
  timeout 1500 python tools/bench_attention.py --iters 20 \
    > /tmp/attn_ab_r05.log 2>&1
  RC=$?; probe_if_timeout $RC
  tail -1 /tmp/attn_ab_r05.log > ATTN_AB_r05.json
  commit_json ATTN_AB_r05.json "ATTN_AB_r05: specialized pipelined exp2 flash kernel (ops/attn_kernel.py) vs round-4 winners (xla_dpa/flash) at the SD self-attention shapes"
fi

# ---- 5. flagship 512^2 train step (adafactor) ------------------------------
# batch ladder 4 -> 2 -> 1: even batch 1 proves the reference's regime
# (512^2 flagship training) FITS and STEPS on one 16GB v5e
for BS in 4 2 1; do
  hardstop_check "TRAIN512_r05 b$BS" 2400 || break
  timeout 2400 python tools/bench_train.py --batch "$BS" --iters 2 \
    --optimizer adafactor | tail -1 > TRAIN512_r05.json
  RC=$?; probe_if_timeout $RC
  json_ok TRAIN512_r05.json && break
  echo "=== TRAIN512 batch $BS failed"
done
commit_json TRAIN512_r05.json "TRAIN512_r05: flagship 512^2 dual-schedule train step on the v5e with ADAFACTOR (AdamW f32 state is 20.9GB for the 1.74B-param flagship, structurally > one 16GB chip; factored second moments are the single-chip-trainable configuration — multi-chip AdamW runs via FSDP, tests/test_parallel_train.py)"

# ---- 6. fused render-in-step flagship (adafactor) ---------------------------
for BS in 4 2 1; do
  hardstop_check "RENDERSTEP512_r05 b$BS" 2400 || break
  timeout 2400 python tools/bench_train.py --batch "$BS" --iters 2 \
    --render-in-step --optimizer adafactor | tail -1 > RENDERSTEP512_r05.json
  RC=$?; probe_if_timeout $RC
  json_ok RENDERSTEP512_r05.json && break
  echo "=== RENDERSTEP512 batch $BS failed"
done
commit_json RENDERSTEP512_r05.json "RENDERSTEP512_r05: FUSED render-in-step flagship 512^2 train step (rasterize+shade SSAA2 + VAE encodes + dual-schedule loss + adafactor as ONE XLA program — the reference's in-loop render regime, train/train.py:184-439)"

# ---- 7. train-set control: the generalization gap -------------------------
if hardstop_check "QUALITY_r05_train_set" 1800; then
  timeout 1800 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/all_meshes" --env-dir "$ROOT/all_envs" \
    --ckpt "$ROOT/run/checkpoints" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 16 --steps 20 --out QUALITY_r05_train_set.json
  RC=$?; probe_if_timeout $RC
  commit_json QUALITY_r05_train_set.json "QUALITY_r05 train-set control (n=16, TRAINING meshes): held-out minus train-set delta measures the generalization gap after the fresh-scenes fix"
fi

# ---- 8. trajectory over preserved snapshots --------------------------------
SNAPS=$(ls -d "$ROOT"/snapshots/checkpoint-* 2>/dev/null \
        | sort -t- -k2 -n | awk 'NR%2==1' | tail -4)
rm -rf "$ROOT/traj"; : > /tmp/traj_parts_r5.txt
for S in $SNAPS; do
  hardstop_check "trajectory point $S" 1200 || break
  N=$(basename "$S" | cut -d- -f2)
  mkdir -p "$ROOT/traj/$N"
  cp -r "$S" "$ROOT/traj/$N/"
  timeout 1200 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/traj/$N" --vae-ckpt artifacts/r04/vae_small.npz \
    --n 8 --steps 10 --out "/tmp/traj_r5_$N.json" \
    && echo "/tmp/traj_r5_$N.json" >> /tmp/traj_parts_r5.txt
  RC=$?; probe_if_timeout $RC
done
python - <<'PYEOF'
import json
parts = [p.strip() for p in open("/tmp/traj_parts_r5.txt") if p.strip()]
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
              open("QUALITY_r05_trajectory.json", "w"), indent=1)
PYEOF
commit_json QUALITY_r05_trajectory.json "QUALITY_r05 trajectory: held-out eval at preserved 10k snapshots of the fresh-scenes run (n=8, 10 UniPC steps)"

# ---- 9. bench.py preflight (the driver runs this at round end) --------------
if hardstop_check "bench preflight" 1800; then
  timeout 1800 python bench.py | tail -1 > /tmp/bench_preflight_r05.json
  RC=$?; probe_if_timeout $RC
  echo "=== bench preflight rc=$RC: $(cat /tmp/bench_preflight_r05.json)"
fi

# ---- 10. VAE v2 with whatever window remains (round-5 priority #2) ----------
# Fresh-scenes warm-start fine-tune from the round-4 VAE (32.3dB recon
# ceiling bounds every map PSNR).  --steps never self-completes inside the
# window; the periodic checkpoint (every 1000 steps) is what gets exported.
REM=$(( HARDSTOP - $(date +%s) - 900 ))
if [ "$REM" -ge 2400 ]; then
  echo "=== $(date -u) VAE v2 stage: ${REM}s window"
  timeout "$REM" python tools/train_vae.py --workdir "$ROOT/vae2" \
    --config small --scene-bank \
    --mesh-dir "$ROOT/all_meshes" --env-dir "$ROOT/all_envs" \
    --steps 400000 --batch 6 --lr 5e-5 \
    --init-params artifacts/r04/vae_small.npz
  RC=$?; echo "=== $(date -u) vae2 rc=$RC"; probe_if_timeout $RC
  UNIRENDER_PLATFORM=cpu timeout 600 python tools/export_params.py \
    --ckpt "$ROOT/vae2/vae_checkpoints" --out artifacts/r05/vae_small_v2.npz
  tail -100 "$ROOT/vae2/vae_metrics.jsonl" \
    > artifacts/r05/vae2_metrics_tail.jsonl 2>/dev/null
  if [ -s artifacts/r05/vae_small_v2.npz ]; then
    git add artifacts/r05 && git commit -m "VAE v2 (round-5 leftover window): scene-bank fresh-scenes fine-tune warm-started from the round-4 16k-step VAE — raising the recon ceiling that bounds every map PSNR; round 6 re-trains/fine-tunes the dual stream against it (latent re-encode consistency)"
    echo "=== committed vae_small_v2"
  fi
else
  echo "=== $(date -u) VAE v2 stage skipped (only ${REM}s left)"
fi

echo "=== $(date -u) round5 finish script complete"
