#!/bin/bash
# Canonical DS-GPS config (reference dirichlet/dsgps/launch.sh, SURVEY.md §6):
# k 30, gamma 0.9, lr 0.01 (launch.sh value; see docs/dsgps_dynamics.md), clip 0.01.
set -e
DATA=${1:-data/dirichlet}
OUT=${2:-results/dsgps_dirichlet}

python -m psignn_tpu.cli.main \
  --family dsgps --variant dirichlet \
  --path_dataset "$DATA" --path_results "$OUT" \
  --k 30 --gamma 0.9 --latent_dim 10 \
  --lr 0.01 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400
