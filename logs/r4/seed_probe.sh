#!/bin/bash
cd /root/repo
for SEED in 7 42 2024; do
  python -m psignn_tpu.cli.main --family dsgps --variant dirichlet \
    --path_dataset data/dirichlet --path_results /tmp/dsgps_seed$SEED \
    --k 30 --gamma 0.9 --latent_dim 10 --lr 1e-3 --gradient_clip 0.01 \
    --batch_size 50 --max_epochs 15 --cache_batches 1 --seed $SEED \
    >> logs/r4/seed_probe.log 2>&1
  echo "=== seed $SEED done ===" >> logs/r4/seed_probe.log
done
