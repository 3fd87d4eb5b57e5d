#!/bin/bash
# round3_finish.sh <deadline_epoch_s>
#
# End-of-round insurance: at the deadline, stop the watched quality run
# (checkpoints survive; the stage resumes next round if wanted), wait out
# the relay lease with one patient probe, then produce the round-3
# artifacts in priority order, COMMITTING AFTER EACH ONE (a hard driver
# cutoff mid-chain must not lose the earlier artifacts):
#   1. QUALITY_r03.json  — eval_quality on the held-out set, FID + LPIPS
#   2. ATTN_AB_r03.json  — attention A/B (dmajor/flash/splash/xla_dpa)
#   3. COLLATE_r03_*.json — jitted-collate throughput evidence
# The driver itself runs bench.py at round end, so no bench here.
# Everything is logged to /tmp/q3/finish.log.
set -u
DEADLINE=${1:?deadline epoch}
cd /root/repo
exec >> /tmp/q3/finish.log 2>&1

commit_one() {  # commit_one <file> <msg>
  git add "$1" 2>/dev/null && git commit -m "$2" 2>/dev/null
}

echo "=== finish script armed; deadline $(date -d @"$DEADLINE" 2>/dev/null || echo "$DEADLINE")"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 30
  # another copy already past the gate? bail
  [ -f /tmp/q3/finish.started ] && exit 0
done
touch /tmp/q3/finish.started
echo "=== $(date -u) deadline reached; stopping training"

# order matters: outer driver first (else it launches the next stage),
# then the watchdog restart loop, then the stage's whole process group
# (setsid in run_watched.sh makes the child pid a pgid).
[ -f /tmp/q3/driver.pid ] && kill "$(cat /tmp/q3/driver.pid)" 2>/dev/null
if [ -f /tmp/q3/watchdog.pid ]; then
  kill "$(cat /tmp/q3/watchdog.pid)" 2>/dev/null
fi
if [ -f /tmp/q3/watchdog.pid.child ]; then
  CPID=$(cat /tmp/q3/watchdog.pid.child)
  kill -- "-$CPID" 2>/dev/null
  sleep 20
  kill -9 -- "-$CPID" 2>/dev/null
fi

echo "=== $(date -u) waiting out the relay lease (patient probe)"
timeout 1500 python -c 'import jax.numpy as jnp; print(jnp.ones((8,8)).sum())'
echo "=== $(date -u) probe done rc=$?"

STEP_INFO=$(ls /tmp/q3/run/checkpoints | sort -t- -k2 -n | tail -1)
echo "=== evaluating at $STEP_INFO"
timeout 2400 python tools/eval_quality.py --config small \
  --mesh-dir /tmp/q3/test/meshes --env-dir /tmp/q3/test/envs \
  --ckpt /tmp/q3/run/checkpoints --vae-ckpt /tmp/q3/run/vae_checkpoints \
  --n 32 --steps 20 --fid --lpips --out /root/repo/QUALITY_r03.json
echo "=== $(date -u) eval rc=$?"
commit_one QUALITY_r03.json "QUALITY_r03: held-out eval of the round-3 trained checkpoint (n=32, FID+LPIPS)"

timeout 1500 python tools/bench_attention.py | tee /tmp/q3/attn_ab.txt
echo "=== $(date -u) attn A/B rc=$?"
tail -1 /tmp/q3/attn_ab.txt > /root/repo/ATTN_AB_r03.json || true
commit_one ATTN_AB_r03.json "ATTN_AB_r03: attention kernel A/B on the real chip (dmajor/flash/splash/xla_dpa)"

timeout 900 python tools/bench_collate.py --mesh-dir /tmp/q3/data/meshes \
  --env-dir /tmp/q3/data/envs --batch 16 --resolution 64 \
  > /root/repo/COLLATE_r03_64.json
echo "=== $(date -u) collate 64 rc=$?"
timeout 900 python tools/bench_collate.py --mesh-dir /tmp/q3/data/meshes \
  --env-dir /tmp/q3/data/envs --batch 4 --resolution 512 --iters 5 \
  > /root/repo/COLLATE_r03_512.json
echo "=== $(date -u) collate 512 rc=$?"
git add COLLATE_r03_64.json COLLATE_r03_512.json 2>/dev/null
git commit -m "COLLATE_r03: jitted-collate throughput on the real chip (64^2 train shape + 512^2)" 2>/dev/null
echo "=== $(date -u) finish script complete"
