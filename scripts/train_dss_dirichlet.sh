#!/bin/bash
# Canonical DSS config (reference dirichlet/dss/launch.sh, SURVEY.md §6):
# k 30, alpha 1e-3, gamma 0.9, lr 0.01, grad clip 0.01, batch 50.
set -e
DATA=${1:-data/dirichlet}
OUT=${2:-results/dss_dirichlet}

python -m psignn_tpu.cli.main \
  --family dss --variant dirichlet \
  --path_dataset "$DATA" --path_results "$OUT" \
  --k 30 --alpha 1e-3 --gamma 0.9 --latent_dim 10 \
  --lr 0.01 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400
