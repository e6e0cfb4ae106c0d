#!/bin/bash
# Watchdog for long-running trainers: the axon tunnel occasionally deadlocks
# a trainer mid-dispatch (process alive, zero CPU, no log progress — observed
# twice in round 4).  Every CHECK_S seconds, any run whose train_metrics.csv
# has not moved for STALE_S seconds gets its recorded PID killed (exact PID
# from results/<run>/trainer.pid, /proc-cmdline-verified — never
# pattern-matched) and is relaunched from results/<run>/relaunch.cmd, which
# the CLI maintains (resumes from running_model.ckpt).
#
# Usage:  nohup bash scripts/train_watchdog.sh > logs/watchdog.log 2>&1 &
cd "$(dirname "$0")/.."
CHECK_S=${CHECK_S:-600}
STALE_S=${STALE_S:-2400}

while true; do
  sleep "$CHECK_S"
  now=$(date +%s)
  for pf in results/*/trainer.pid; do
    [ -f "$pf" ] || continue
    run=$(dirname "$pf")
    pid=$(cat "$pf")
    case "$pid" in ''|*[!0-9]*) continue;; esac
    tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q psignn_tpu || continue
    # A 'T' (stopped) state means bench.py pause_trainers() or
    # tools/with_quiet_chip.sh deliberately SIGSTOPped this trainer for a
    # quiet-chip measurement; its log is stale on purpose.  Killing it here
    # would recreate the chip contention the pause exists to avoid
    # (round-4 advisor finding).
    state=$(awk '{print $3}' "/proc/$pid/stat" 2>/dev/null)
    [ "$state" = "T" ] && continue
    log="$run/logs/train_metrics.csv"
    [ -f "$log" ] || continue
    age=$(( now - $(stat -c %Y "$log") ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "$(date -u +%FT%TZ) watchdog: $run stale ${age}s, restarting pid $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      rm -f "$pf"
      if [ -f "$run/relaunch.cmd" ]; then
        nohup bash -c "$(cat "$run/relaunch.cmd")" \
          >> "logs/watchdog_$(basename "$run").log" 2>&1 &
        echo "$(date -u +%FT%TZ) watchdog: relaunched $run as $!"
      fi
    fi
  done
done
