#!/bin/bash
# run_watched.sh "<command>" <progress_file> [stale_sec] [pidfile]
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
    if [ -f "$PROGRESS" ]; then
      REF=$(stat -c %Y "$PROGRESS")
      LIMIT=$STALE
      # freshly (re)started process that hasn't written yet: compare to start
      if [ "$REF" -lt "$START" ]; then REF=$START; LIMIT=$FIRST_STALE; fi
    else
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
