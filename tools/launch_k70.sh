#!/bin/bash
# VERDICT r4 missing #3 / next #8: a second point on the reference's
# dsgps config grid — k=70, gamma=1.0 (reference endpoint val Res
# 2.18e-3 at ep399; matched-epoch targets 7.8e-3@49, 4.5e-3@99,
# 70_ite_gamma_1/logs/{model_config,train_metrics}.csv: lr 1e-3,
# clip 0.01).  Bounded to 120 epochs for the round; resumable.
set -e
cd "$(dirname "$0")/.."
OUT=results/dsgps_k70_g1
nohup python -m psignn_tpu.cli.main \
  --family dsgps --variant dirichlet \
  --path_dataset data/dirichlet --path_results $OUT \
  --k 70 --gamma 1.0 --latent_dim 10 --lr 1e-3 --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 120 --cache_batches 1 --seed 7 --spike_guard \
  $( [ -f "$OUT/ckpt/running_model.ckpt" ] && echo "--resume $OUT/ckpt/running_model.ckpt" ) \
  > logs/r5/train_k70.log 2>&1 &
echo "k70 $!"
