"""Checkpointing: running/best/final rotating pytree checkpoints.

Replaces the reference's ``torch.save`` dicts (training_class.py:296-333)
with a numpy-pickle of the device-fetched pytree plus JSON-able metadata.
The same best/running/final policy is applied by the trainer.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], dirname: str, name: str) -> str:
    os.makedirs(dirname, exist_ok=True)
    path = os.path.join(dirname, f"{name}.ckpt")
    host_state = dict(state)
    for k in ("params", "opt_state"):
        if k in host_state and host_state[k] is not None:
            host_state[k] = _to_host(host_state[k])
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
