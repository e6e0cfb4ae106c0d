#!/bin/bash
# Evaluate the FROM-SCRATCH-TRAINED checkpoints (not the converted reference
# ones) on the held-out test split — the "a reference user can switch" proof.
# Writes per-family metric tables under results/<run>/eval/ and is summarised
# by hand into docs/TRAINED.md.  Pauses our own trainers around each eval so
# the timings are clean (tools/with_quiet_chip.sh).
set -e
cd "$(dirname "$0")/.."

for fam_run in psignn:psignn_dirichlet dsgps:dsgps_dirichlet dss:dss_dirichlet; do
  fam=${fam_run%%:*}; run=${fam_run##*:}
  ck="results/$run/ckpt/best_model.ckpt"
  [ -f "$ck" ] || { echo "skip $run (no ckpt)"; continue; }
  echo "== $run"
  bash tools/with_quiet_chip.sh python -m psignn_tpu.eval.run_eval \
    --ckpt "$ck" --path_dataset data/dirichlet \
    --out "results/$run/eval" "$@"
done
