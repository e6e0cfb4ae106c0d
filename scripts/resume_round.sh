#!/bin/bash
# Round-rollover helper: the datasets under data/ are gitignored (3 GB), so a
# fresh container starts without them.  Generation is fully seeded (seed 1234,
# psignn_tpu/data/generate.py) and reproduces byte-identical archives, which
# keeps the committed checkpoints under results/*/ckpt resumable.
#
# Usage:  bash scripts/resume_round.sh
# Regenerates missing datasets, then resumes every training run that has a
# running_model.ckpt (and starts from scratch the ones that don't).
set -e
cd "$(dirname "$0")/.."
mkdir -p logs/resume

[ -f data/dirichlet/A_sparse_matrix.npy ] || \
  python -m psignn_tpu.data.generate --path_data data/dirichlet \
    --n_mesh 200 --n_samples 50 --variant dirichlet
[ -f data/mixed/A_sparse_matrix.npy ] || \
  python -m psignn_tpu.data.generate --path_data data/mixed \
    --n_mesh 200 --n_samples 50 --variant mixed

resume_flag() {  # $1 = results dir
  local ck="$1/ckpt/running_model.ckpt"
  [ -f "$ck" ] && echo "--resume $ck"
}

run_lr() {  # $1 = results dir, $2 = fallback
  # A resume must continue in the checkpoint's own lr regime: the trainer
  # reads lr from the CLI, not the checkpoint, and resuming the dsgps run at
  # 10x its trained lr destroys its progress (docs/dsgps_dynamics.md).
  local cfg="$1/logs/model_config.csv"
  local lr=""
  [ -f "$cfg" ] && lr=$(sed -n "s/^'lr':'\([^']*\)'.*/\1/p" "$cfg" | head -1)
  echo "${lr:-$2}"
}

# Flagship Ψ-GNN (canonical broyden config, SURVEY.md §6).  Only psignn uses
# --pallas here: the k-unrolled families Python-unroll 30 pallas_calls
# (fwd+bwd), whose compiled programs accumulate host memory across epochs
# (observed 56-78 GB RSS -> OOM, round 3); their XLA scan path is leaner.
# --cache_batches 1 on every run: the axon tunnel client retains each
# host->device staging buffer (~one batch of host RSS per train step, never
# freed -> OOM after ~10h); cached batches upload once and sidestep it.
nohup python -m psignn_tpu.cli.main --family psignn --variant dirichlet \
  --path_dataset data/dirichlet --path_results results/psignn_dirichlet \
  --solver broyden --fw_tol 1e-5 --fw_thres 500 --bw_tol 1e-8 --bw_thres 500 \
  --latent_dim 10 --n_layers 1 --lr_deq 0.01 --lr_ae 0.05 \
  --sched_step_deq 0.5 --sched_step_ae 0.5 --gradient_clip 0.1 --jac_weight 1.0 \
  --batch_size 50 --max_epochs 700 --pallas --cache_batches 1 \
  $(resume_flag results/psignn_dirichlet) \
  > logs/resume/psignn.log 2>&1 &
echo "psignn $!" > logs/resume/pids.txt

nohup python -m psignn_tpu.cli.main --family dss --variant dirichlet \
  --path_dataset data/dirichlet --path_results results/dss_dirichlet \
  --k 30 --alpha 1e-3 --gamma 0.9 --latent_dim 10 \
  --lr 0.01 --gradient_clip 0.01 --batch_size 50 --max_epochs 400 --cache_batches 1 \
  $(resume_flag results/dss_dirichlet) \
  > logs/resume/dss.log 2>&1 &
echo "dss $!" >> logs/resume/pids.txt

nohup python -m psignn_tpu.cli.main --family dsgps --variant dirichlet \
  --path_dataset data/dirichlet --path_results results/dsgps_dirichlet \
  --k 30 --gamma 0.9 --latent_dim 10 --seed 7 --spike_guard \
  --lr "$(run_lr results/dsgps_dirichlet 1e-3)" --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400 --cache_batches 1 \
  $(resume_flag results/dsgps_dirichlet) \
  > logs/resume/dsgps.log 2>&1 &
echo "dsgps $!" >> logs/resume/pids.txt

# --enc_loss_mode freeze: the round-5 fix for the detach-semantics Enc
# explosion on our mixed data realization (docs/dsgps_dynamics.md round-5
# addendum; the archived detach arm is results/dsgps_mixed_detach_arm)
nohup nice -n 8 python -m psignn_tpu.cli.main --family dsgps --variant mixed \
  --path_dataset data/mixed --path_results results/dsgps_mixed \
  --k 30 --gamma 0.9 --latent_dim 10 --spike_guard --neumann_init_scale 0.1 \
  --enc_loss_mode freeze --seed 7 \
  --lr "$(run_lr results/dsgps_mixed 1e-3)" --gradient_clip 0.01 \
  --batch_size 50 --max_epochs 400 --cache_batches 1 \
  $(resume_flag results/dsgps_mixed) \
  > logs/resume/dsgps_mixed.log 2>&1 &
echo "dsgps_mixed $!" >> logs/resume/pids.txt

# Mixed-BC Ψ-GNN (round-5 from-scratch run; reference: mixed/psignn 400
# epochs, endpoint val Res 3.17e-3)
nohup bash scripts/train_psignn_mixed.sh > logs/resume/psignn_mixed.log 2>&1 &
echo "psignn_mixed $!" >> logs/resume/pids.txt

nohup bash scripts/train_watchdog.sh > logs/resume/watchdog.log 2>&1 &
echo "watchdog $!" >> logs/resume/pids.txt

echo "Launched (PIDs in logs/resume/pids.txt).  Monitor with:"
echo "  tail -f results/*/logs/train_metrics.csv"
echo "Stop with exact PIDs only:  kill \$(awk '{print \$2}' logs/resume/pids.txt)"
