#!/bin/bash
# Waits for the dss run (exact PID) to exit, then resumes dsgps_mixed from its
# best checkpoint (epoch 10, val Res 0.28) at the recorded-config lr 1e-3
# with the round-4 spike guard (reload best + halve lr on sustained spikes).
cd /root/repo
DSS_PID=$(cat results/dss_dirichlet/trainer.pid 2>/dev/null)
if [ -n "$DSS_PID" ]; then
  while kill -0 "$DSS_PID" 2>/dev/null; do sleep 60; done
fi
exec python -m psignn_tpu.cli.main --family dsgps --variant mixed \
  --path_dataset data/mixed --path_results results/dsgps_mixed \
  --k 30 --gamma 0.9 --latent_dim 10 --lr 1e-3 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400 --cache_batches 1 --spike_guard \
  --resume results/dsgps_mixed/ckpt/best_model.ckpt
