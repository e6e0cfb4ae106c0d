#!/bin/bash
# VERDICT r4 weak #4 / next #5: discharge the --cache_batches deviation.
# Waits for the dsgps_dirichlet 400-epoch run to finish (final_model.ckpt
# appears), then launches two 40-epoch from-scratch arms differing ONLY in
# batch-membership freezing:
#   arm A: --cache_batches 1  (frozen membership — the axon-leak workaround
#          every flagship run used)
#   arm B: --cache_batches 0  (true per-epoch reshuffling, reference
#          semantics; bounded 40-epoch run stays well under the staging-leak
#          OOM horizon of ~10 h)
# Identical seed/init/lr/clip; no spike guard (clean dynamics comparison).
set -u
cd "$(dirname "$0")/.."
FINAL=results/dsgps_dirichlet/ckpt/final_model.ckpt
# Gate on final_model being NEWER than this launch, not mere existence —
# a stale final_model.ckpt from an earlier bounded run made the r5
# invocation fire immediately, overlapping the arms with the flagship
# run's last 16 annealing epochs (advisor r5 finding; noted in the A/B
# writeup in docs/PERF.md).
T0=$(date +%s)
echo "waiting for $FINAL newer than $(date -u -d @$T0 +%FT%TZ) ..."
while :; do
  if [ -f "$FINAL" ] && [ "$(stat -c %Y "$FINAL")" -ge "$T0" ]; then break; fi
  sleep 20
  [ $(( $(date +%s) - T0 )) -gt 86400 ] && { echo "timed out"; exit 2; }
done
echo "dsgps_dirichlet finished; launching A/B arms"

common="--family dsgps --variant dirichlet --path_dataset data/dirichlet \
  --k 30 --gamma 0.9 --latent_dim 10 --lr 1e-3 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 40 --seed 7"

nohup python -m psignn_tpu.cli.main $common \
  --path_results results/ab_frozen --cache_batches 1 \
  > logs/r5/ab_frozen.log 2>&1 &
echo "ab_frozen $!"
nohup python -m psignn_tpu.cli.main $common \
  --path_results results/ab_reshuffle --cache_batches 0 \
  > logs/r5/ab_reshuffle.log 2>&1 &
echo "ab_reshuffle $!"
