#!/bin/bash
# Canonical Ψ-GNN Dirichlet training config (reference
# dirichlet/psignn/launch_slurm.sh:14-40, SURVEY.md §6): latent_dim 10,
# n_layers 1, broyden, fw_tol 1e-5, fw_thres 500, bw_tol 1e-8, lr_deq 0.01,
# lr_ae 0.05, grad clip 0.1, jac_weight 1.0, batch 50.
set -e
DATA=${1:-data/dirichlet}
OUT=${2:-results/psignn_dirichlet}

python -m psignn_tpu.cli.main \
  --family psignn --variant dirichlet \
  --path_dataset "$DATA" --path_results "$OUT" \
  --solver broyden --fw_tol 1e-5 --fw_thres 500 --bw_tol 1e-8 --bw_thres 500 \
  --latent_dim 10 --n_layers 1 \
  --lr_deq 0.01 --lr_ae 0.05 --sched_step_deq 0.5 --sched_step_ae 0.5 \
  --gradient_clip 0.1 --jac_weight 1.0 \
  --batch_size 50 --max_epochs 700
