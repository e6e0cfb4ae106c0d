"""Minimal functional NN blocks (explicit param pytrees, pure applies).

Mirrors the reference's building blocks (``dirichlet/psignn/model.py:310-406``)
— Xavier-uniform Linear layers with zero bias, MLPs with an activation between
hidden layers, LayerNorm — as pure functions over nested param dicts.  A
functional design keeps params first-class pytrees, which is what
``jax.custom_vjp`` (the DEQ implicit backward) and ``optax`` partitioned
optimizers want; no flax/haiku module machinery on the hot path.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def xavier_uniform(key, fan_in: int, fan_out: int, gain: float = 1.0,
                   dtype=jnp.float32) -> jax.Array:
    """Xavier/Glorot uniform, matching torch ``nn.init.xavier_uniform_``
    (reference ``initialize_weights_xavier``, psignn/model.py:310-314)."""
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -a, a)


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> Params:
    return {
        "w": xavier_uniform(key, fan_in, fan_out, dtype=dtype),
        "b": jnp.zeros((fan_out,), dtype),
    }


# Full-f32 matmuls everywhere: TPU's default bf16-input matmul puts a
# ~3-decimal-digit noise floor on activations, which caps how far the
# physics residual ‖Au−b‖² can be driven down (the reference trains in f32;
# with the default precision our dsgps training plateaued ~50x above the
# reference residual).  These matmuls are tiny (latent_dim 10) and
# bandwidth-bound, so the precision costs no measurable wall-clock.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def linear_apply(p: Params, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], precision=MATMUL_PRECISION) + p["b"]


def mlp_init(key, hidden_channels: Sequence[int], dtype=jnp.float32) -> List[Params]:
    """MLP over ``hidden_channels=[in, h1, ..., out]`` (model.py:316-332)."""
    keys = jax.random.split(key, len(hidden_channels) - 1)
    return [
        linear_init(k, hidden_channels[i], hidden_channels[i + 1], dtype)
        for i, k in enumerate(keys)
    ]


def mlp_apply(params: List[Params], x: jax.Array,
              activation: Callable = jax.nn.relu,
              final_activation: bool = False) -> jax.Array:
    """Activation between layers; none after the last unless
    ``final_activation`` (the DSGPS gate MLPs end in sigmoid/tanh —
    ``MLPActivation``, dsgps/model.py:209-225)."""
    n = len(params)
    for i, p in enumerate(params):
        x = linear_apply(p, x)
        if i < n - 1 or final_activation:
            x = activation(x)
    return x


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, matching torch ``nn.LayerNorm``
    (biased variance, eps inside the sqrt)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
