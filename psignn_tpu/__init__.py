"""psignn_tpu — a TPU-native framework for learned iterative Poisson solvers.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mnastorg/PSI-GNN (PyTorch + PyTorch-Geometric): three GNN model families
(psignn deep-equilibrium, dsgps gated-recurrent, dss feed-forward) that solve
FEM discretizations of the 2-D Poisson equation on unstructured triangular
meshes, for Dirichlet and mixed Dirichlet+Neumann boundary conditions.

Layout (see SURVEY.md §7):
  graphs   — PaddedGraph container: fixed-shape batched mesh graphs
  nn       — functional MLP / LayerNorm blocks with Xavier init
  ops      — message passing, residual losses, autoencoder
  solvers  — picard / anderson / broyden / newton fixed-point solvers
  deq      — implicit-function-theorem fixed point with jax.custom_vjp
  models   — psignn, dsgps, dss (dirichlet + mixed via bc_mode)
  data     — mesh generation, P1 FEM assembly, dataset factory + reader
  train    — train step, dual optimizers, plateau scheduler, checkpoints
  dist     — device-mesh data parallelism and graph-partition parallelism
  kernels  — Pallas TPU kernels for gather/scatter message passing and SpMV
  eval     — metric tables, growing-geometry sweep, OOD geometry zoo
"""

__version__ = "0.1.0"
