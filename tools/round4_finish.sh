#!/bin/bash
# round4_finish.sh <deadline_epoch_s> [root=/tmp/q4] [hardstop_epoch_s]
#
# End-of-round driver: at the deadline (or as soon as the quality run
# completes), stop the watched quality run, wait out the relay lease, then
# produce round-4 artifacts in priority order, COMMITTING AFTER EACH ONE.
# Round-3 post-mortem rules (VERDICT weak #1/#4): an artifact is committed
# ONLY if it is non-empty AND parses as JSON; failures are recorded as
# explicit error stanzas, never as empty files or mislabeled successes.
#   1. artifacts/r04/*.npz + metrics tails — durable trained state
#   2. QUALITY_r04.json — eval of the RESTORED checkpoint (hard-fails on a
#      missing checkpoint by construction — tools/eval_quality.py)
#   3. QUALITY_r04_random_baseline.json — same harness/VAE, random dual
#   3b. QUALITY_r04_trajectory.json — eval at preserved 10k snapshots
#   4. TRAIN512_r04.json — flagship 512^2 train step on the chip
#   4b. RENDERSTEP512_r04.json — fused render-in-step flagship train step
#   5. COLLATE_r04_{64,512}.json — jitted collate after the gather fix
#   6. ATTN_AB_r04.json — attention A/B incl. the new auto routing
# Logged to /tmp/q4/finish.log.
#
# Relay discipline (PERF.md): a `timeout`-killed TPU client leaves a stale
# remote lease that wedges the NEXT client for ~10 min.  After any step
# that exits >=124 (timeout fired) we run ONE patient probe to absorb the
# wedge before moving on.  And HARDSTOP: past this epoch we stop launching
# TPU work entirely so the round driver's bench.py gets a free chip.
set -u
DEADLINE=${1:?deadline epoch}
ROOT=${2:-/tmp/q4}
HARDSTOP=${3:-$((DEADLINE + 6600))}
cd /root/repo
exec >> "$ROOT/finish.log" 2>&1

json_ok() {  # non-empty AND parseable
  [ -s "$1" ] && python -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null
}

commit_json() {  # commit_json <file> <msg> — only if valid JSON
  if json_ok "$1"; then
    git add "$1" && git commit -m "$2" && echo "=== committed $1"
  else
    echo "=== NOT committing $1 (missing/empty/unparseable)"
    rm -f "$1"
  fi
}

hardstop_check() {  # hardstop_check <name> <step_timeout_s>
  # HARDSTOP is an ABSOLUTE bound: a step may start only if even its full
  # timeout would finish before HARDSTOP, so the round driver's bench.py
  # always gets a free chip.
  if [ "$(( $(date +%s) + ${2:-0} ))" -gt "$HARDSTOP" ]; then
    echo "=== $(date -u) HARDSTOP would be breached by '$1' (+${2:-0}s); exiting to free the chip"
    exit 0
  fi
}

probe_if_timeout() {  # probe_if_timeout <rc> — absorb a stale lease
  if [ "$1" -ge 124 ]; then
    echo "=== $(date -u) previous step rc=$1 (killed); patient probe to clear the lease"
    timeout 1200 python -c 'import jax.numpy as jnp; print(jnp.ones((8,8)).sum())' \
      >/dev/null 2>&1
    echo "=== $(date -u) probe rc=$?"
  fi
}

echo "=== finish script armed; deadline $(date -ud @"$DEADLINE" 2>/dev/null || echo "$DEADLINE"); hardstop $(date -ud @"$HARDSTOP" 2>/dev/null || echo "$HARDSTOP")"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 30
  [ -f "$ROOT/finish.started" ] && exit 0
  # if the run already completed, start finishing early
  grep -q "QUALITY RUN COMPLETE" "$ROOT/driver.log" 2>/dev/null && break
done
touch "$ROOT/finish.started"
echo "=== $(date -u) deadline/complete; stopping training"

# order matters: outer driver first (else it launches the next stage),
# then the watchdog restart loop, then the stage's whole process group.
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
mkdir -p artifacts/r04
UNIRENDER_PLATFORM=cpu timeout 900 python tools/export_params.py \
  --ckpt "$ROOT/run/checkpoints" --out artifacts/r04/dual_small.npz
UNIRENDER_PLATFORM=cpu timeout 600 python tools/export_params.py \
  --ckpt "$ROOT/run/vae_checkpoints" --out artifacts/r04/vae_small.npz
tail -200 "$ROOT/run/metrics.jsonl" > artifacts/r04/metrics_tail.jsonl 2>/dev/null
tail -100 "$ROOT/run/vae_metrics.jsonl" > artifacts/r04/vae_metrics_tail.jsonl 2>/dev/null
if [ -s artifacts/r04/dual_small.npz ]; then
  git add artifacts/r04 && git commit -m "Round-4 trained weights (params-only f16 npz, config.small) + train metrics tails — durable across VMs; restorable via eval_quality/train --ckpt/--init-params .npz"
  echo "=== committed artifacts/r04"
else
  echo "=== NO dual checkpoint to export; committing VAE/metrics only if present"
  git add artifacts/r04 2>/dev/null && git commit -m "Round-4 VAE weights / metrics tails (dual-stream checkpoint absent)" || true
fi

# ---- 2. quality eval (hard-fails on missing checkpoint) -------------------
hardstop_check "QUALITY_r04" 3000
timeout 3000 python tools/eval_quality.py --config small \
  --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
  --ckpt "$ROOT/run/checkpoints" --vae-ckpt "$ROOT/run/vae_checkpoints" \
  --n 32 --steps 20 --lpips --dump-images artifacts/r04/grids \
  --out QUALITY_r04.json
RC=$?; echo "=== $(date -u) eval rc=$RC"; probe_if_timeout $RC
STEP=$(python -c "import json; print(json.load(open('QUALITY_r04.json'))['checkpoint_step'])" 2>/dev/null || echo "?")
commit_json QUALITY_r04.json "QUALITY_r04: held-out eval of the restored round-4 checkpoint (step $STEP, n=32, LPIPS; FID omitted — uncalibrated without ported Inception weights)"
if ls artifacts/r04/grids/*.png >/dev/null 2>&1; then
  git add artifacts/r04/grids && git commit -m "Visual eval grids for QUALITY_r04: GT row over prediction row (image/fwd render, normal, albedo, spec, diff) per held-out object" && echo "=== committed eval grids"
fi

# ---- 3. random-dual baseline, same harness + same trained VAE -------------
hardstop_check "QUALITY_r04_random_baseline" 3000
timeout 3000 python tools/eval_quality.py --config small \
  --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
  --vae-ckpt "$ROOT/run/vae_checkpoints" \
  --n 32 --steps 20 --lpips --out QUALITY_r04_random_baseline.json
RC=$?; echo "=== $(date -u) baseline eval rc=$RC"; probe_if_timeout $RC
commit_json QUALITY_r04_random_baseline.json "QUALITY_r04 random-dual baseline: same harness, same trained VAE, random dual-stream weights (n=32) — the no-training control"

# ---- 3b. training trajectory: eval up to 3 preserved snapshots ------------
# (snapshot_loop.sh copies every 10k-step checkpoint out of rotation)
hardstop_check "QUALITY_r04_trajectory" 1200
SNAPS=$(ls -d "$ROOT"/snapshots/checkpoint-* 2>/dev/null \
        | sort -t- -k2 -n | awk 'NR==1 || NR%2==1' | tail -3)
rm -rf "$ROOT/traj"; : > /tmp/traj_parts.txt
for S in $SNAPS; do
  hardstop_check "trajectory point $S" 1200
  N=$(basename "$S" | cut -d- -f2)
  mkdir -p "$ROOT/traj/$N"
  cp -r "$S" "$ROOT/traj/$N/"
  timeout 1200 python tools/eval_quality.py --config small \
    --mesh-dir "$ROOT/test/meshes" --env-dir "$ROOT/test/envs" \
    --ckpt "$ROOT/traj/$N" --vae-ckpt "$ROOT/run/vae_checkpoints" \
    --n 8 --steps 10 --out "/tmp/traj_$N.json" \
    && echo "/tmp/traj_$N.json" >> /tmp/traj_parts.txt
  RC=$?; probe_if_timeout $RC
done
python - <<'PYEOF'
import json
parts = [p.strip() for p in open("/tmp/traj_parts.txt") if p.strip()]
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
              open("QUALITY_r04_trajectory.json", "w"), indent=1)
PYEOF
commit_json QUALITY_r04_trajectory.json "QUALITY_r04 trajectory: held-out eval at preserved 10k-step snapshots (n=8, 10 UniPC steps) — metric-vs-training-step curve for the round-4 run"

# ---- 4. flagship 512^2 train step on the chip -----------------------------
hardstop_check "TRAIN512_r04" 2400
timeout 2400 python tools/bench_train.py --batch 4 --iters 2 | tail -1 > TRAIN512_r04.json
RC=$?; probe_if_timeout $RC
if ! json_ok TRAIN512_r04.json; then
  hardstop_check "TRAIN512_r04 retry" 2400
  echo "=== batch 4 failed; retrying batch 2"
  timeout 2400 python tools/bench_train.py --batch 2 --iters 2 | tail -1 > TRAIN512_r04.json
  RC=$?; probe_if_timeout $RC
fi
commit_json TRAIN512_r04.json "TRAIN512_r04: flagship 512^2 dual-schedule train step measured on the v5e (bf16/f32, remat, full loss incl. cycle)"

# ---- 4b. fused render-in-step flagship train step -------------------------
hardstop_check "RENDERSTEP512_r04" 2400
timeout 2400 python tools/bench_train.py --batch 4 --iters 2 --render-in-step \
  | tail -1 > RENDERSTEP512_r04.json
RC=$?; probe_if_timeout $RC
if ! json_ok RENDERSTEP512_r04.json; then
  hardstop_check "RENDERSTEP512_r04 retry" 2400
  echo "=== render-in-step batch 4 failed; retrying batch 2"
  timeout 2400 python tools/bench_train.py --batch 2 --iters 2 \
    --render-in-step | tail -1 > RENDERSTEP512_r04.json
  RC=$?; probe_if_timeout $RC
fi
commit_json RENDERSTEP512_r04.json "RENDERSTEP512_r04: FUSED render-in-step flagship train step on the v5e — rasterize+shade 512^2 SSAA2 + VAE encodes + dual-schedule loss + optimizer as ONE XLA program (the reference's in-loop render regime, train/train.py:184-439)"

# ---- 5. jitted collate after the lane-friendly gather fix -----------------
hardstop_check "COLLATE_r04_64" 1200
timeout 1200 python tools/bench_collate.py --mesh-dir "$ROOT/data/meshes" \
  --env-dir "$ROOT/data/envs" --batch 16 --resolution 64 \
  | tail -1 > COLLATE_r04_64.json
RC=$?; probe_if_timeout $RC
commit_json COLLATE_r04_64.json "COLLATE_r04 64^2: jitted render-collate throughput (train shape) after the per-channel gather fix"
hardstop_check "COLLATE_r04_512" 1800
timeout 1800 python tools/bench_collate.py --mesh-dir "$ROOT/data/meshes" \
  --env-dir "$ROOT/data/envs" --batch 4 --resolution 512 --iters 5 \
  | tail -1 > COLLATE_r04_512.json
RC=$?; probe_if_timeout $RC
commit_json COLLATE_r04_512.json "COLLATE_r04 512^2: jitted render-collate at the reference's training resolution (batch 4, SSAA 2) — the round-3 OOM shape, now lane-friendly gathers"

# ---- 6. attention A/B with the adopted auto routing -----------------------
hardstop_check "ATTN_AB_r04" 1500
timeout 1500 python tools/bench_attention.py | tail -1 > ATTN_AB_r04.json
RC=$?; probe_if_timeout $RC
commit_json ATTN_AB_r04.json "ATTN_AB_r04: attention kernel A/B (dmajor/flash/splash/xla_dpa) — default routing now auto (xla_dpa at S4096/D40, flash at S1024/D80)"

echo "=== $(date -u) finish script complete"
