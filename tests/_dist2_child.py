"""Child process for the 2-process ``jax.distributed`` smoke test.

Run as ``python _dist2_child.py <process_id> <port>``: initializes the
multi-host runtime (2 processes x 4 CPU devices each = 8 global devices),
builds a global dp-sharded batch of graphs with
``jax.make_array_from_callback``, and runs the real psignn DP train-step
loss+grads across the process boundary (collectives over the distributed
runtime — the jax-native replacement for the reference's absent NCCL/MPI
story, SURVEY.md §5.8).

The module doubles as the oracle helper for the parent test: the data and
loss builders below are deterministic, so the single-process 8-device value
must equal the 2-process value.
"""

import sys

import numpy as np


def build_inputs():
    """Deterministic params + 8 tiny graph samples (identical everywhere)."""
    import jax
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_samples
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import PsignnConfig, psignn_init

    cfg = PsignnConfig(solver="broyden", fw_tol=1e-3, fw_thres=12,
                       bw_tol=1e-4, bw_thres=12)
    params = jax.tree.map(np.asarray,
                          psignn_init(jax.random.PRNGKey(0), cfg))
    samples = _tiny_samples(n_meshes=8, hsize=0.35)
    caps = dict(n_node_cap=256, n_edge_cap=2048)
    per_dev = [batch_graphs([s], **caps) for s in samples]
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *per_dev)
    return cfg, params, stacked


def make_loss_fn(cfg):
    from psignn_tpu.models import psignn_forward

    def loss_fn(p, graph, rng):
        out = psignn_forward(p, graph, cfg, rng, training=True)
        l = out.losses
        total = (l["residual_loss"] + l["jacobian_loss"]
                 + l["encoder_loss"] + l["autoencoder_loss"])
        return total, {"res": l["residual_loss"]}

    return loss_fn


def run(mesh):
    """DP loss + grad-norm of the global batch on the given 8-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from psignn_tpu.dist import dp_value_and_grad

    cfg, params, stacked = build_inputs()

    def globalize(x):
        sh = NamedSharding(mesh, P("dp"))
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])

    stacked_g = jax.tree.map(globalize, stacked)
    vag = jax.jit(dp_value_and_grad(make_loss_fn(cfg), mesh))
    rng = np.asarray(jax.random.PRNGKey(2))
    loss, aux, grads = vag(params, stacked_g, rng)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree.leaves(grads)))
    return float(loss), float(gnorm)


def run_partitioned(mesh):
    """ONE graph node-partitioned over all 8 GLOBAL devices: the halo
    ppermutes and the psum'd Broyden stopping norms cross the process
    boundary (4 local devices per process).  Deterministic, so the parent
    compares against the single-process 8-device oracle."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.dist.partitioned import (build_partitioned_graph,
                                             partitioned_psignn_inference)
    from psignn_tpu.kernels import rcm_permutation
    from psignn_tpu.kernels.fused_mp import apply_node_permutation
    from psignn_tpu.models import PsignnConfig, psignn_init

    rng = np.random.default_rng(3)
    mesh_geo = blob_mesh(radius=1.0, hsize=0.12, rng=rng)
    s = psignn_sample_from_fem(solve_poisson(mesh_geo, 1.0, rng))
    perm = rcm_permutation(s["senders"], s["receivers"], len(s["x"]))
    s = apply_node_permutation(s, perm)
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-4, fw_thres=30,
                       bw_thres=12)
    params = jax.tree.map(np.asarray, psignn_init(jax.random.PRNGKey(0), cfg))
    pg = build_partitioned_graph(s, n_parts=8)

    def globalize(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P("x"))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    pg_g = jax.tree.map(globalize, pg)
    u, ns, lowest, res = partitioned_psignn_inference(params, pg_g, cfg, mesh)
    ssq = jax.jit(lambda a: jnp.sum(jnp.square(a)))(u)
    return float(ssq), int(np.asarray(ns)), float(np.asarray(res))


def main():
    process_id, port = int(sys.argv[1]), int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "dp"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_default_matmul_precision", "highest")

    from psignn_tpu.dist import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4
    assert multihost.is_coordinator() == (process_id == 0)

    if mode == "partitioned":
        mesh = multihost.global_mesh(axis="x")
        ssq, ns, res = run_partitioned(mesh)
        print(f"DIST2_SSQ={ssq:.10f}")
        print(f"DIST2_NSTEP={ns}")
        print(f"DIST2_RES={res:.10f}")
    else:
        mesh = multihost.global_mesh(axis="dp")
        loss, gnorm = run(mesh)
        print(f"DIST2_LOSS={loss:.10f}")
        print(f"DIST2_GNORM={gnorm:.8f}")
    print("DIST2_OK")


if __name__ == "__main__":
    main()
