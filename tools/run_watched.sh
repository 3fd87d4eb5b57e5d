#!/bin/bash
# run_watched.sh "<command>" <progress_paths> [stale_sec] [pidfile]
#
# <progress_paths> is a COLON-separated list of files and/or directories;
# the freshest mtime among those that exist counts as progress.  Pass
# every side-effect the stage produces (metrics file AND the batch-pool
# dir): round 3's VAE stage was killed mid-pool-render because the
# watchdog only looked at the metrics file, which the trainer creates at
# init and doesn't touch again until the ~70-min pool render finishes.
#
# Runs a (checkpoint-resumable) training stage and restarts it whenever its
# progress file stops advancing — the axon TPU relay intermittently wedges
# mid-run (observed round 3: a VAE stage froze at step 6725 with the client
# spinning), and the only recovery is kill + patient re-acquire (the relay
# frees a dead client's lease after ~10 min; the restarted process blocks
# in backend init until then, which is exactly the patient-probe pattern
# CLAUDE.md prescribes).  Stages resume from their checkpoints, so a
# restart loses at most checkpoint_every steps.
#
# The stage runs in its own session (setsid) so a kill reaches the python
# TPU client, not just the `bash -c` wrapper — an orphaned client would
# hold the relay lease forever and the restarted stage would never start.
# If [pidfile] is given, the watchdog writes its own pid there and the
# current stage's process-group id to "$pidfile.child" (refreshed on every
# restart) so an external stopper (round3_finish.sh) can take it all down.
CMD="$1"
PROGRESS="$2"
STALE=${3:-600}
PIDFILE=${4:-}
FIRST_STALE=$((STALE * 3))      # first start pays compile + possible lease wait

[ -n "$PIDFILE" ] && echo $$ > "$PIDFILE"

while true; do
  setsid bash -c "$CMD" &
  PID=$!
  [ -n "$PIDFILE" ] && echo "$PID" > "$PIDFILE.child"
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    NEWEST=0
    IFS=':' read -ra PATHS <<< "$PROGRESS"
    for P in "${PATHS[@]}"; do
      if [ -e "$P" ]; then
        T=$(stat -c %Y "$P")
        [ "$T" -gt "$NEWEST" ] && NEWEST=$T
      fi
    done
    if [ "$NEWEST" -gt 0 ] && [ "$NEWEST" -ge "$START" ]; then
      REF=$NEWEST
      LIMIT=$STALE
    else
      # no progress artifact newer than this (re)start yet: allow
      # compile + lease-reacquire time
      REF=$START
      LIMIT=$FIRST_STALE
    fi
    AGE=$((NOW - REF))
    if [ "$AGE" -gt "$LIMIT" ]; then
      echo "WATCHDOG: no progress for ${AGE}s (> ${LIMIT}); restarting stage" >&2
      kill -- "-$PID" 2>/dev/null
      sleep 10
      kill -9 -- "-$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  if [ "$RC" -eq 0 ]; then
    exit 0
  fi
  echo "WATCHDOG: stage exited rc=$RC; restarting (resume from checkpoint)" >&2
  sleep 30
done
