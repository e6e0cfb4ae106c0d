"""Optimizers and schedulers matching the reference trainer semantics.

* Adam with externally-injected learning rate so the host-side plateau
  scheduler can anneal it without retracing (the reference uses two
  ``torch.optim.Adam`` instances over the DEQ vs autoencoder partitions,
  ``dirichlet/psignn/training_class.py:52-58``).
* Global-norm gradient clipping over ALL params jointly before both
  optimizer steps (training_class.py:163).
* ``PlateauScheduler`` reproduces ``torch.optim.lr_scheduler.
  ReduceLROnPlateau`` defaults: mode='min', patience=10, rel threshold 1e-4,
  cooldown 0, factor from config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def init_adam(params) -> optax.OptState:
    return optax.scale_by_adam().init(params)


def adam_update(grads, state, params, lr):
    """One Adam step with traced lr (bias-corrected, eps=1e-8 like torch)."""
    tx = optax.scale_by_adam()
    updates, state = tx.update(grads, state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, state


def clip_by_global_norm(grads, max_norm: float):
    """torch ``clip_grad_norm_`` semantics: scale by max_norm/(total+1e-6)
    when the total norm exceeds max_norm."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), total


@dataclasses.dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode='min')."""

    lr: float
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return dict(lr=self.lr, factor=self.factor, patience=self.patience,
                    threshold=self.threshold, min_lr=self.min_lr,
                    best=self.best, num_bad=self.num_bad)

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        for k, v in d.items():
            setattr(self, k, v)
