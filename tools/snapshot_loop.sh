#!/bin/bash
# snapshot_loop.sh [root=/tmp/q5]
# Preserve every 10k-step checkpoint from orbax rotation (total_limit=5
# deletes older ones) so the round-end eval can show a training trajectory.
ROOT=${1:-/tmp/q5}
mkdir -p "$ROOT/snapshots"
while true; do
  for d in "$ROOT"/run/checkpoints/checkpoint-*0000; do
    [ -d "$d" ] || continue
    b=$(basename "$d")
    if [ ! -d "$ROOT/snapshots/$b" ]; then
      # only copy once the orbax dir is complete (no tmp markers)
      if ! ls "$d" | grep -q tmp; then
        cp -r "$d" "$ROOT/snapshots/.$b.partial" && \
          mv "$ROOT/snapshots/.$b.partial" "$ROOT/snapshots/$b" && \
          echo "snapshot $b at $(date -u)"
      fi
    fi
  done
  sleep 120
done
