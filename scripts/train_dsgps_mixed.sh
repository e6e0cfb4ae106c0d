#!/bin/bash
# Mixed-BC DS-GPS (reference mixed/dsgps/launch.sh).
set -e
DATA=${1:-data/mixed}
OUT=${2:-results/dsgps_mixed}

python -m psignn_tpu.cli.main \
  --family dsgps --variant mixed \
  --path_dataset "$DATA" --path_results "$OUT" \
  --k 30 --gamma 0.9 --latent_dim 10 \
  --lr 0.001 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400
