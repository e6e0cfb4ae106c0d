#!/bin/bash
# Run a command with OUR training processes paused (SIGSTOP) so it gets the
# single TPU chip to itself, then resume them.  PIDs come exclusively from
# results/*/trainer.pid files written by psignn_tpu.cli.main, verified
# against /proc/<pid>/cmdline — never pattern-matched.
#
# Usage: bash tools/with_quiet_chip.sh <command...>
cd "$(dirname "$0")/.."
PAUSED=()
for pf in results/*/trainer.pid; do
  [ -f "$pf" ] || continue
  pid=$(cat "$pf")
  case "$pid" in ''|*[!0-9]*) continue;; esac
  if tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q psignn_tpu; then
    kill -STOP "$pid" 2>/dev/null && PAUSED+=("$pid")
  fi
done
resume() { for p in "${PAUSED[@]}"; do kill -CONT "$p" 2>/dev/null; done; }
trap resume EXIT INT TERM
[ "${#PAUSED[@]}" -gt 0 ] && sleep 5   # drain in-flight device programs
"$@"
