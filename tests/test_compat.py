"""Reference checkpoint conversion + behavioral parity checks.

The reference's trained checkpoints are converted into our param pytrees and
run through our models.  Beyond shape/load smoke tests, the strongest
available oracle without torch_geometric is a hand-rolled numpy forward of
the reference architecture on a tiny graph using the converted weights —
our jax model must match it to float tolerance.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
DSGPS_CKPT = os.path.join(
    REF, "dirichlet/dsgps/results/constant_dataset/30_ite_gamma_0_9/ckpt/best_model.pt")
DSS_CKPT = os.path.join(REF, "dirichlet/dss/results/dss_results/ckpt/best_model.pt")
PSIGNN_CKPT = os.path.join(
    REF, "dirichlet/psignn/results/constant_dataset/ckpt/best_model.pt")

needs_ref = pytest.mark.skipif(not os.path.exists(DSGPS_CKPT),
                               reason="reference checkpoints not mounted")


@needs_ref
def test_convert_all_families_shapes():
    from psignn_tpu.compat import convert_reference_checkpoint
    import jax

    out = convert_reference_checkpoint(DSGPS_CKPT, "dsgps")
    p = out["params"]
    assert p["phi_to"][0]["w"].shape == (23, 10)
    assert p["z_k"][0]["w"].shape == (32, 10)

    out = convert_reference_checkpoint(DSS_CKPT, "dss")
    L = out["params"]["layers"]
    assert L["phi_to"][0]["w"].shape == (30, 21, 10)
    assert L["decoder"][1]["w"].shape == (30, 10, 1)

    out = convert_reference_checkpoint(PSIGNN_CKPT, "psignn")
    f = out["params"]["function"]
    assert f["alpha"]["w"].shape == (32, 1)
    assert f["layers"][0]["update"][0]["w"].shape == (32, 10)
    assert out["params"]["autoencoder"]["encoder"][0]["w"].shape == (1, 10)


def _numpy_reference_dsgps_step(sd, H, H0, senders, receivers, ea, prb, dmask):
    """Hand-rolled numpy forward of one ModelDSGPS update
    (dirichlet/dsgps/model.py:72-89) from the torch state_dict."""
    def lin(prefix, x):
        w = sd[prefix + ".weight"].numpy()
        b = sd[prefix + ".bias"].numpy()
        return x @ w.T + b

    def mlp2(prefix, x):
        return lin(prefix + ".2", np.maximum(lin(prefix + ".0", x), 0.0))

    def mp(prefix, agg_at):
        out = np.zeros_like(H)
        for e in range(len(senders)):
            i, j = senders[e], receivers[e]
            if i == j:
                continue
            if agg_at == "col":   # Phi_to: aggregate at receivers, x_i=recv
                xi, xj, tgt = H[j], H[i], j
            else:                 # Phi_from: aggregate at senders, x_i=send
                xi, xj, tgt = H[i], H[j], i
            feats = np.concatenate([xi, xj, ea[e]])[None]
            out[tgt] += mlp2(prefix, feats)[0]
        return out

    mess_to = mp("phi_to.mlp.mlp", "col")
    mess_from = mp("phi_from.mlp.mlp", "row")
    concat = np.concatenate([H, mess_to, mess_from, prb], axis=1)
    z = 1.0 / (1.0 + np.exp(-lin("z_k.mlp.0", concat)))
    r = 1.0 / (1.0 + np.exp(-lin("r_k.mlp.0", concat)))
    corr = np.tanh(lin("correction.mlp.0",
                       np.concatenate([r * H, mess_to, mess_from, prb], 1)))
    H_next = H + z * corr
    H_next[dmask] = H0[dmask]
    return H_next


@needs_ref
def test_dsgps_activation_parity_vs_numpy_reference():
    """Our jax dsgps step == the reference architecture executed in numpy
    with the trained weights, on a random small graph."""
    import jax
    import jax.numpy as jnp
    from psignn_tpu.compat import convert_reference_checkpoint, \
        load_reference_checkpoint
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import DsgpsConfig
    from psignn_tpu.models.dsgps import _step, _enc_apply

    ck = load_reference_checkpoint(DSGPS_CKPT)
    sd = ck["state_dict"]
    out = convert_reference_checkpoint(DSGPS_CKPT, "dsgps")
    params = out["params"]

    rng = np.random.default_rng(0)
    n = 24
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, i] = 1.0
        for j in rng.choice(n, 3, replace=False):
            dense[i, j] = rng.normal()
            dense[j, i] = dense[i, j]
    s, r = np.nonzero(dense)
    tags = (rng.uniform(size=(n, 1)) < 0.3).astype(np.float32)
    sample = dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        b=rng.normal(size=(n, 1)).astype(np.float32),
        sol=rng.normal(size=(n, 1)).astype(np.float32),
        prb_data=rng.normal(size=(n, 2)).astype(np.float32),
        tags=tags, pos=np.zeros((n, 2), np.float32),
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        a_ij=dense[s, r].reshape(-1, 1),
        edge_attr=rng.normal(size=(len(s), 3)).astype(np.float32))
    g = batch_graphs([sample])

    cfg = DsgpsConfig(k=30)
    H0 = np.asarray(_enc_apply(params["autoencoder"], g.x) * g.fnode_mask)
    H_jax = np.asarray(_step(params, cfg, g, jnp.asarray(H0), jnp.asarray(H0)))

    dmask = tags[:, 0] == 1
    H_np = _numpy_reference_dsgps_step(
        sd, H0[:n], H0[:n], s, r, sample["edge_attr"], sample["prb_data"],
        dmask)
    np.testing.assert_allclose(H_jax[:n], H_np, rtol=2e-4, atol=2e-5)


@needs_ref
def test_converted_models_run_end_to_end(tmp_path):
    """All three converted reference models produce finite predictions on
    our generated data."""
    import jax
    from psignn_tpu.compat import convert_reference_checkpoint
    from psignn_tpu.data.generate import generate_data, add_dss_variable
    from psignn_tpu.data.reader import load_dataset
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import (DsgpsConfig, DssConfig, PsignnConfig,
                                   dsgps_inference, dss_inference,
                                   psignn_inference)

    data = str(tmp_path)
    generate_data(data, n_mesh=1, n_samples=2, hsize=0.25, seed=61,
                  verbose=False)
    add_dss_variable(data)

    g = batch_graphs(load_dataset(data, family="psignn")[:1])
    out = convert_reference_checkpoint(DSGPS_CKPT, "dsgps")
    u = dsgps_inference(out["params"], g, DsgpsConfig(k=30))
    assert np.isfinite(np.asarray(u)).all()

    out = convert_reference_checkpoint(PSIGNN_CKPT, "psignn")
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-5, fw_thres=80)
    u, nstep, lowest = psignn_inference(out["params"], g, cfg)
    assert np.isfinite(np.asarray(u)).all()
    assert int(nstep) > 0

    gd = batch_graphs(load_dataset(data, family="dss")[:1])
    out = convert_reference_checkpoint(DSS_CKPT, "dss")
    u = dss_inference(out["params"], gd, DssConfig(k=30))
    assert np.isfinite(np.asarray(u)).all()


def _numpy_reference_psignn_function(sd, h, h0, senders, receivers, ea, prb,
                                     dmask):
    """Hand-rolled numpy forward of the reference Function (one layer):
    two directional MPs + sigmoid gate + gated update MLP + LayerNorm +
    hard Dirichlet reset (dirichlet/psignn/model.py:279-300)."""
    def lin(prefix, x):
        w = sd[prefix + ".weight"].numpy()
        b = sd[prefix + ".bias"].numpy()
        return x @ w.T + b

    def mlp2(prefix, x):
        return lin(prefix + ".2", np.maximum(lin(prefix + ".0", x), 0.0))

    def mp(prefix, agg_at):
        out = np.zeros_like(h)
        for e in range(len(senders)):
            i, j = senders[e], receivers[e]
            if i == j:
                continue
            if agg_at == "col":
                xi, xj, tgt = h[j], h[i], j
            else:
                xi, xj, tgt = h[i], h[j], i
            feats = np.concatenate([xi, xj, ea[e]])[None]
            out[tgt] += mlp2(prefix, feats)[0]
        return out

    mp_to = mp("deqdss.f.phi_to_list.0.mlp.mlp", "col")
    mp_from = mp("deqdss.f.phi_from_list.0.mlp.mlp", "row")
    concat = np.concatenate([h, mp_to, mp_from, prb], axis=1)
    alpha = 1.0 / (1.0 + np.exp(-lin("deqdss.f.alpha.0", concat)))
    update = alpha * mlp2("deqdss.f.update_list.0.mlp", concat)
    hn = h + update
    mu = hn.mean(axis=1, keepdims=True)
    var = ((hn - mu) ** 2).mean(axis=1, keepdims=True)
    g = sd["deqdss.f.laynorm.weight"].numpy()
    bln = sd["deqdss.f.laynorm.bias"].numpy()
    hn = (hn - mu) / np.sqrt(var + 1e-5) * g + bln
    hn[dmask] = h0[dmask]
    return hn


@needs_ref
def test_psignn_function_activation_parity():
    """Our jax Function == numpy re-execution of the reference architecture
    with the trained checkpoint weights."""
    import jax.numpy as jnp
    from psignn_tpu.compat import (convert_reference_checkpoint,
                                   load_reference_checkpoint)
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import PsignnConfig
    from psignn_tpu.models.psignn import make_function, encoder_apply

    ck = load_reference_checkpoint(PSIGNN_CKPT)
    sd = ck["state_dict"]
    out = convert_reference_checkpoint(PSIGNN_CKPT, "psignn")
    params = out["params"]

    rng = np.random.default_rng(1)
    n = 20
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, i] = 1.0
        for j in rng.choice(n, 3, replace=False):
            dense[i, j] = rng.normal()
            dense[j, i] = dense[i, j]
    s, r = np.nonzero(dense)
    tags = (rng.uniform(size=(n, 1)) < 0.3).astype(np.float32)
    sample = dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        b=rng.normal(size=(n, 1)).astype(np.float32),
        sol=rng.normal(size=(n, 1)).astype(np.float32),
        prb_data=rng.normal(size=(n, 2)).astype(np.float32),
        tags=tags, pos=np.zeros((n, 2), np.float32),
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        a_ij=dense[s, r].reshape(-1, 1),
        edge_attr=rng.normal(size=(len(s), 3)).astype(np.float32))
    g = batch_graphs([sample])

    cfg = PsignnConfig()
    f = make_function(cfg)
    h0 = np.asarray(encoder_apply(params["autoencoder"], g.x) * g.fnode_mask)
    h_jax = np.asarray(f(params["function"], jnp.asarray(h0),
                         jnp.asarray(h0), g))

    dmask = tags[:, 0] == 1
    h_np = _numpy_reference_psignn_function(
        sd, h0[:n], h0[:n], s, r, sample["edge_attr"], sample["prb_data"],
        dmask)
    np.testing.assert_allclose(h_jax[:n], h_np, rtol=2e-4, atol=2e-5)
