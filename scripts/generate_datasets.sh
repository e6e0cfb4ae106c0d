#!/bin/bash
# Dataset factory: 200 meshes x 50 samples per variant (reference defaults,
# dirichlet/dataset/generate_data.py:150-151).
set -e
python -m psignn_tpu.data.generate --path_data data/dirichlet \
  --n_mesh ${N_MESH:-200} --n_samples ${N_SAMPLES:-50} --variant dirichlet
python -m psignn_tpu.data.generate --path_data data/mixed \
  --n_mesh ${N_MESH:-200} --n_samples ${N_SAMPLES:-50} --variant mixed
