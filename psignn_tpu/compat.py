"""Reference-checkpoint compatibility: torch ``.pt`` → psignn_tpu params.

The reference ships golden checkpoints under ``results/*/ckpt/*.pt``
(SURVEY.md §4).  This module converts their ``state_dict`` tensors into our
functional param pytrees so trained reference models can be evaluated inside
this framework (growing-geometry sweep, metric tables) and serve as parity
oracles.  torch Linear weights are (out, in) and ours are (in, out), hence
the transposes.

psignn checkpoints pickle a solver *function* from the reference's
``utilities`` module inside ``hyperparameters``; ``load_reference_checkpoint``
stubs that module out before unpickling.
"""

from __future__ import annotations

import sys
import types
from typing import Dict

import numpy as np


def load_reference_checkpoint(path: str) -> Dict:
    """torch.load with a stub ``utilities.solver`` module so psignn
    checkpoints (which pickle solver function references) unpickle."""
    import torch

    if "utilities" not in sys.modules:
        utilities = types.ModuleType("utilities")
        solver = types.ModuleType("utilities.solver")
        for name in ("broyden", "anderson", "forward_iteration", "newton"):
            setattr(solver, name, (lambda *a, **k: None))
        utilities.solver = solver
        sys.modules["utilities"] = utilities
        sys.modules["utilities.solver"] = solver
    return torch.load(path, map_location="cpu", weights_only=False)


def _lin(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"].detach().numpy()).T.copy()
    b = np.asarray(sd[prefix + ".bias"].detach().numpy()).copy()
    return {"w": w, "b": b}


def _mlp2(sd, prefix):
    """Two-layer reference MLP: Sequential indices 0 and 2 (ReLU at 1)."""
    return [_lin(sd, prefix + ".0"), _lin(sd, prefix + ".2")]


def _mlp1(sd, prefix):
    """Single-layer MLPActivation: Sequential index 0."""
    return [_lin(sd, prefix + ".0")]


def _autoencoder(sd, prefix="autoencoder"):
    return {
        "encoder": _mlp2(sd, f"{prefix}.encoder.mlp.mlp"),
        "decoder": _mlp2(sd, f"{prefix}.decoder.mlp.mlp"),
    }


def convert_dsgps(state_dict, bc_mode: str = "dirichlet") -> Dict:
    """ModelDSGPS state_dict → dsgps_init-compatible pytree
    (dirichlet/dsgps/model.py:27-46)."""
    sd = state_dict
    params = {
        "laynorm": {"scale": np.asarray(sd["laynorm.weight"].numpy()).copy(),
                    "bias": np.asarray(sd["laynorm.bias"].numpy()).copy()},
        "phi_to": _mlp2(sd, "phi_to.mlp.mlp"),
        "phi_from": _mlp2(sd, "phi_from.mlp.mlp"),
        "z_k": _mlp1(sd, "z_k.mlp"),
        "r_k": _mlp1(sd, "r_k.mlp"),
        "correction": _mlp1(sd, "correction.mlp"),
        "autoencoder": _autoencoder(sd),
    }
    if bc_mode == "mixed":
        params["phi_neumann"] = _mlp2(sd, "phi_neumann.mlp.mlp")
        params["update_neumann"] = _mlp2(sd, "update_neumann.mlp")
    return params


def convert_dss(state_dict, k: int) -> Dict:
    """DeepStatisticalSolver state_dict → stacked dss params
    (dirichlet/dss/model.py:34-55)."""
    sd = state_dict

    def stack(fn):
        per = [fn(i) for i in range(k)]
        return [  # list over MLP layers, each {w,b} stacked on axis 0
            {"w": np.stack([p[j]["w"] for p in per]),
             "b": np.stack([p[j]["b"] for p in per])}
            for j in range(len(per[0]))
        ]

    layers = {
        "phi_to": stack(lambda i: _mlp2(sd, f"phi_to_list.{i}.mlp.mlp")),
        "phi_from": stack(lambda i: _mlp2(sd, f"phi_from_list.{i}.mlp.mlp")),
        "psi": stack(lambda i: _mlp2(sd, f"psi_list.{i}.mlp.mlp")),
        "decoder": stack(lambda i: _mlp2(sd, f"decoder_list.{i}.mlp.mlp")),
    }
    return {"layers": layers}


def convert_psignn(state_dict, n_layers: int = 1,
                   bc_mode: str = "dirichlet") -> Dict:
    """ModelDEQDSS state_dict → psignn params
    (dirichlet/psignn/model.py:28-54, 263-277)."""
    sd = state_dict
    layers = []
    for kk in range(n_layers):
        layers.append({
            "phi_to": _mlp2(sd, f"deqdss.f.phi_to_list.{kk}.mlp.mlp"),
            "phi_from": _mlp2(sd, f"deqdss.f.phi_from_list.{kk}.mlp.mlp"),
            "update": _mlp2(sd, f"deqdss.f.update_list.{kk}.mlp"),
        })
    function = {
        "layers": layers,
        "alpha": _lin(sd, "deqdss.f.alpha.0"),
        "laynorm": {
            "scale": np.asarray(sd["deqdss.f.laynorm.weight"].numpy()).copy(),
            "bias": np.asarray(sd["deqdss.f.laynorm.bias"].numpy()).copy()},
    }
    if bc_mode == "mixed":
        function["phi_neumann"] = _mlp2(sd, "deqdss.f.phi_neumann.mlp.mlp")
        function["update_neumann"] = _mlp2(sd, "deqdss.f.update_neumann.mlp")
    return {"autoencoder": _autoencoder(sd), "function": function}


def convert_reference_checkpoint(path: str, family: str,
                                 bc_mode: str = "dirichlet") -> Dict:
    """Load + convert in one step; returns dict(params, hyperparameters)."""
    ck = load_reference_checkpoint(path)
    sd = ck["state_dict"]
    hp = {k: v for k, v in ck.get("hyperparameters", {}).items()
          if isinstance(v, (int, float, str, bool))}
    if family == "dsgps":
        params = convert_dsgps(sd, bc_mode)
    elif family == "dss":
        params = convert_dss(sd, int(hp.get("k", 30)))
    elif family == "psignn":
        params = convert_psignn(sd, int(hp.get("n_layers", 1)), bc_mode)
    else:
        raise ValueError(family)
    import jax.numpy as jnp
    import jax
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return {"params": params, "hyperparameters": hp, "torch_ckpt": ck}
