"""Data parallelism over batched graphs via shard_map.

Replaces ``torch_geometric.nn.DataParallel`` (replica-per-GPU, Python list
scatter, ``dirichlet/psignn/main.py:106``) with the jax-idiomatic version:
the loader produces one fixed-shape PaddedGraph per device, the per-device
graphs are stacked on a leading 'dp' axis and sharded over a 1-D
``jax.sharding.Mesh``; the loss/grad computation runs per shard inside
``shard_map`` and gradients/losses reduce with ``pmean`` over ICI — the
collective XLA compiles onto the interconnect, no NCCL/MPI analog needed
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graphs import PaddedGraph


def make_mesh(n_devices: int = 0, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stack_graphs(graphs: Sequence[PaddedGraph]) -> PaddedGraph:
    """Stack per-device graphs along a new leading 'dp' axis.

    All graphs must share caps and num_graphs (the loader guarantees this
    with ``drop_last`` + fixed caps).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def shard_stacked(stacked: PaddedGraph, mesh: Mesh, axis: str = "dp"):
    """Place a stacked graph so the leading axis is sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def dp_value_and_grad(loss_fn: Callable, mesh: Mesh, axis: str = "dp",
                      sink_dim: int = 0):
    """Build a data-parallel value_and_grad: params replicated, graph sharded.

    ``loss_fn(params, graph, rng) -> (loss, aux)`` runs on each device's
    local graph; the shard_mapped computation returns the ``pmean``-ed loss
    (reference DataParallel averages replica losses,
    training_class.py:156-159) and we differentiate *through* shard_map so
    the cotangent reduction onto the replicated params is handled by jax
    itself (taking grads w.r.t. replicated inputs inside the body would
    auto-psum them and double-count a manual pmean).

    ``sink_dim > 0`` threads a ``(sink_dim,)`` zero gradient sink through
    each shard (``loss_fn(params, graph, rng, sink)``) and additionally
    returns its cotangent averaged over the mesh — the DEQ backward-solve
    stats channel (deq.py: the sink cotangent IS the (lowest, nstep) pair,
    so the shard_map psum sums raw per-shard values and we divide by the
    mesh size).  Restores backward_iteration.csv logging under
    --data_parallel (round-4 advisor finding).
    """

    def dp_loss(params, graph_stacked, rng, sink=None):
        def local(p, g_stacked, r, *s):
            graph = jax.tree.map(
                lambda x: x.reshape(x.shape[1:]) if x.ndim > 0 else x,
                g_stacked)
            # decorrelate stochastic probes (jacobian loss) across devices
            r = jax.random.fold_in(r, jax.lax.axis_index(axis))
            loss, aux = (loss_fn(p, graph, r, *s) if s
                         else loss_fn(p, graph, r))
            loss = jax.lax.pmean(loss, axis)
            aux = jax.tree.map(lambda a: jax.lax.pmean(a, axis), aux)
            return loss, aux

        # check_vma=False: solver while_loops carry invariant-typed values
        # (traces, stop flags) that become device-varying after one step;
        # the vma checker would demand explicit pcasts inside the solvers.
        # Autodiff through shard_map still inserts the psum on the params
        # cotangent (verified against the per-device-average oracle in
        # tests/test_dist.py).
        args = (params, graph_stacked, rng)
        specs = (P(), P(axis), P())
        if sink is not None:
            args += (sink,)
            specs += (P(),)
        return shard_map(local, mesh=mesh,
                         in_specs=specs,
                         out_specs=(P(), P()),
                         check_vma=False)(*args)

    if sink_dim:
        n_dev = mesh.devices.size

        def vag(params, graph_stacked, rng):
            sink0 = jnp.zeros((sink_dim,), jnp.float32)
            (loss, aux), (grads, gsink) = jax.value_and_grad(
                dp_loss, argnums=(0, 3), has_aux=True)(
                    params, graph_stacked, rng, sink0)
            return loss, aux, grads, gsink / n_dev

        return vag

    def vag(params, graph_stacked, rng):
        (loss, aux), grads = jax.value_and_grad(
            dp_loss, has_aux=True)(params, graph_stacked, rng)
        return loss, aux, grads

    return vag


def dp_train_step(loss_fn: Callable, mesh: Mesh, optimizer_update: Callable,
                  axis: str = "dp"):
    """Full DP train step: shard_mapped grads + replicated optimizer update.

    ``optimizer_update(grads, opt_state, params, lr) -> (params, opt_state)``
    """
    vag = dp_value_and_grad(loss_fn, mesh, axis)

    def step(params, opt_state, graph_stacked, rng, lr):
        loss, aux, grads = vag(params, graph_stacked, rng)
        params, opt_state = optimizer_update(grads, opt_state, params, lr)
        return params, opt_state, loss, aux

    return step
