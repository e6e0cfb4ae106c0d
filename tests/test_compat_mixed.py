"""Mixed-BC parity: converted mixed checkpoints vs numpy re-execution.

The reference ships trained mixed-BC checkpoints
(mixed/psignn/results/best_model, mixed/dsgps/results/30_ite_lamb_0_gamma_0_9);
these tests convert them (compat) and verify our mixed Function/step against
a hand-rolled numpy forward of the reference architecture
(mixed/psignn/model.py:211-244, mixed/dsgps/model.py:75-99), then run the
converted models end to end on generated mixed data.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
PSIGNN_MIXED = os.path.join(REF, "mixed/psignn/results/best_model/ckpt/best_model.pt")
DSGPS_MIXED = os.path.join(
    REF, "mixed/dsgps/results/30_ite_lamb_0_gamma_0_9/ckpt/best_model.pt")

needs_ref = pytest.mark.skipif(not os.path.exists(PSIGNN_MIXED),
                               reason="reference mixed checkpoints not mounted")


def _mixed_toy_sample(seed=3, n=22):
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, i] = 1.0
        for j in rng.choice(n, 3, replace=False):
            dense[i, j] = rng.normal()
            dense[j, i] = dense[i, j]
    s, r = np.nonzero(dense)
    # one-hot tags: interior / dirichlet / neumann
    kind = rng.choice(3, size=n, p=[0.6, 0.2, 0.2])
    tags = np.eye(3, dtype=np.float32)[kind]
    return dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        b=rng.normal(size=(n, 1)).astype(np.float32),
        sol=rng.normal(size=(n, 1)).astype(np.float32),
        prb_data=rng.normal(size=(n, 3)).astype(np.float32),
        tags=tags, pos=np.zeros((n, 2), np.float32),
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        a_ij=dense[s, r].reshape(-1, 1),
        edge_attr=rng.normal(size=(len(s), 3)).astype(np.float32),
        unit_normal_vector=rng.normal(size=(n, 2)).astype(np.float32)), kind


def _np_lin(sd, prefix, x):
    w = sd[prefix + ".weight"].numpy()
    b = sd[prefix + ".bias"].numpy()
    return x @ w.T + b


def _np_mlp2(sd, prefix, x):
    return _np_lin(sd, prefix + ".2", np.maximum(_np_lin(sd, prefix + ".0", x), 0.0))


def _np_mp(sd, prefix, h, senders, receivers, ea, agg_at):
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
        out[tgt] += _np_mlp2(sd, prefix, feats)[0]
    return out


@needs_ref
def test_mixed_psignn_function_activation_parity():
    """Our mixed Function == numpy re-execution of mixed/psignn/model.py
    Function.forward (lines 216-244) with the trained weights."""
    import jax.numpy as jnp
    from psignn_tpu.compat import (convert_reference_checkpoint,
                                   load_reference_checkpoint)
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import PsignnConfig
    from psignn_tpu.models.psignn import make_function, encoder_apply

    ck = load_reference_checkpoint(PSIGNN_MIXED)
    sd = ck["state_dict"]
    out = convert_reference_checkpoint(PSIGNN_MIXED, "psignn",
                                       bc_mode="mixed")
    params = out["params"]

    sample, kind = _mixed_toy_sample()
    n = len(kind)
    g = batch_graphs([sample])
    cfg = PsignnConfig(bc_mode="mixed")
    f = make_function(cfg)
    h0 = np.asarray(encoder_apply(params["autoencoder"], g.x) * g.fnode_mask)
    h_jax = np.asarray(f(params["function"], jnp.asarray(h0),
                         jnp.asarray(h0), g))

    # numpy re-execution
    h = h0[:n]
    s, r, ea = sample["senders"], sample["receivers"], sample["edge_attr"]
    mp_to = _np_mp(sd, "deqdss.f.phi_to_list.0.mlp.mlp", h, s, r, ea, "col")
    mp_from = _np_mp(sd, "deqdss.f.phi_from_list.0.mlp.mlp", h, s, r, ea, "row")
    mp_neu = _np_mp(sd, "deqdss.f.phi_neumann.mlp.mlp", h, s, r, ea, "row")
    concat = np.concatenate([h, mp_to, mp_from, sample["prb_data"]], axis=1)
    alpha = 1.0 / (1.0 + np.exp(-_np_lin(sd, "deqdss.f.alpha.0", concat)))
    update = alpha * _np_mlp2(sd, "deqdss.f.update_list.0.mlp", concat)
    concat_neu = np.concatenate([h, mp_neu, sample["prb_data"],
                                 sample["unit_normal_vector"]], axis=1)
    upd_neu = _np_mlp2(sd, "deqdss.f.update_neumann.mlp", concat_neu)
    hn = h + update
    hn[kind == 2] = upd_neu[kind == 2]
    mu = hn.mean(axis=1, keepdims=True)
    var = ((hn - mu) ** 2).mean(axis=1, keepdims=True)
    gg = sd["deqdss.f.laynorm.weight"].numpy()
    bb = sd["deqdss.f.laynorm.bias"].numpy()
    hn = (hn - mu) / np.sqrt(var + 1e-5) * gg + bb
    hn[kind == 1] = h0[:n][kind == 1]

    np.testing.assert_allclose(h_jax[:n], hn, rtol=2e-4, atol=2e-5)


@needs_ref
def test_mixed_dsgps_step_activation_parity():
    """Our mixed dsgps _step == numpy re-execution of
    mixed/dsgps/model.py:75-99 with the trained weights."""
    import jax.numpy as jnp
    from psignn_tpu.compat import (convert_reference_checkpoint,
                                   load_reference_checkpoint)
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import DsgpsConfig
    from psignn_tpu.models.dsgps import _step, _enc_apply

    ck = load_reference_checkpoint(DSGPS_MIXED)
    sd = ck["state_dict"]
    out = convert_reference_checkpoint(DSGPS_MIXED, "dsgps", bc_mode="mixed")
    params = out["params"]

    sample, kind = _mixed_toy_sample(seed=9)
    n = len(kind)
    g = batch_graphs([sample])
    cfg = DsgpsConfig(k=30, bc_mode="mixed")
    H0 = np.asarray(_enc_apply(params["autoencoder"], g.x) * g.fnode_mask)
    H_jax = np.asarray(_step(params, cfg, g, jnp.asarray(H0), jnp.asarray(H0)))

    h = H0[:n]
    s, r, ea = sample["senders"], sample["receivers"], sample["edge_attr"]
    mess_to = _np_mp(sd, "phi_to.mlp.mlp", h, s, r, ea, "col")
    mess_from = _np_mp(sd, "phi_from.mlp.mlp", h, s, r, ea, "row")
    mp_neu = _np_mp(sd, "phi_neumann.mlp.mlp", h, s, r, ea, "row")
    concat = np.concatenate([h, mess_to, mess_from, sample["prb_data"]], 1)
    z = 1.0 / (1.0 + np.exp(-_np_lin(sd, "z_k.mlp.0", concat)))
    rr = 1.0 / (1.0 + np.exp(-_np_lin(sd, "r_k.mlp.0", concat)))
    corr = np.tanh(_np_lin(sd, "correction.mlp.0", np.concatenate(
        [rr * h, mess_to, mess_from, sample["prb_data"]], 1)))
    concat_neu = np.concatenate([h, mp_neu, sample["prb_data"],
                                 sample["unit_normal_vector"]], 1)
    upd_neu = _np_mlp2(sd, "update_neumann.mlp", concat_neu)
    hn = h + z * corr
    hn[kind == 2] = upd_neu[kind == 2]
    hn[kind == 1] = H0[:n][kind == 1]

    np.testing.assert_allclose(H_jax[:n], hn, rtol=2e-4, atol=2e-5)


@needs_ref
def test_mixed_converted_models_end_to_end(tmp_path):
    """Converted mixed checkpoints produce finite solutions with sane
    residuals on freshly generated mixed-BC data."""
    from psignn_tpu.compat import convert_reference_checkpoint
    from psignn_tpu.data.generate import generate_data
    from psignn_tpu.data.reader import load_dataset
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import (DsgpsConfig, PsignnConfig,
                                   dsgps_inference, psignn_inference)
    from psignn_tpu.ops import residual_loss, mse_masked

    data = str(tmp_path)
    generate_data(data, n_mesh=2, n_samples=2, hsize=0.1, seed=77,
                  variant="mixed", verbose=False)
    g = batch_graphs(load_dataset(data, family="psignn", variant="mixed")[:2])

    out = convert_reference_checkpoint(PSIGNN_MIXED, "psignn", bc_mode="mixed")
    cfg = PsignnConfig(bc_mode="mixed", solver="broyden", fw_tol=1e-4,
                       fw_thres=200)
    u, nstep, lowest = psignn_inference(out["params"], g, cfg)
    assert np.isfinite(np.asarray(u)).all() and int(nstep) > 0
    mse_p = float(mse_masked(u, g.sol, g.node_mask))

    out = convert_reference_checkpoint(DSGPS_MIXED, "dsgps", bc_mode="mixed")
    u2 = dsgps_inference(out["params"], g, DsgpsConfig(k=30, bc_mode="mixed"))
    assert np.isfinite(np.asarray(u2)).all()
    mse_d = float(mse_masked(u2, g.sol, g.node_mask))
    # trained models must beat the trivial zero predictor on their own task
    mse_zero = float(mse_masked(np.zeros_like(np.asarray(u)), g.sol,
                                g.node_mask))
    assert mse_p < mse_zero and mse_d < mse_zero
