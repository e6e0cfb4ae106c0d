#!/bin/bash
# Canonical DS-GPS config (reference dirichlet/dsgps/launch.sh, SURVEY.md §6):
# k 30, gamma 0.9, lr 0.001, grad clip 0.01, batch 50.
# NOTE: launch.sh says lr 0.01, but the checked-in golden run used lr 0.001
# (results/.../logs/model_config.csv and the per-epoch LR lines).
set -e
DATA=${1:-data/dirichlet}
OUT=${2:-results/dsgps_dirichlet}

python -m psignn_tpu.cli.main \
  --family dsgps --variant dirichlet \
  --path_dataset "$DATA" --path_results "$OUT" \
  --k 30 --gamma 0.9 --latent_dim 10 \
  --lr 0.001 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400
