"""Mixed-DSGPS latent-trajectory probe (round-5 forensics).

Round-4 left dsgps-mixed "sick, not slow": Enc ~ 4e2 dominating a ~5e3
total loss at epoch 180 (VERDICT weak #2).  Mechanism hypothesis: in the
mixed (detach) enc-loss semantics (mixed/dsgps/model.py:108-115) the Enc
term backprops ONLY into the encoder, so a large-latent trajectory cannot
be fixed by the Enc gradient itself; meanwhile global-norm clip 0.01 on a
Enc-dominated gradient starves the residual gradient that would shrink
``update_neumann``.  Escape therefore requires an init/trajectory that
never enters the large-latent regime.

This probe measures, for a checkpoint OR a fresh (seed, neumann_init_scale)
init, the per-iteration latent scale on neumann/interior rows and the
per-iteration enc loss, on a real validation batch:

    JAX_PLATFORMS=cpu python tools/mixed_latent_probe.py --ckpt results/dsgps_mixed/ckpt/running_model.ckpt
    JAX_PLATFORMS=cpu python tools/mixed_latent_probe.py --seed_scan 0 40 --neumann_init_scale 0.1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_batch(n=20):
    from psignn_tpu.data.reader import (GraphLoader, load_dataset,
                                        split_dataset)
    samples = load_dataset("data/mixed", family="dsgps", variant="mixed")
    _, val, _ = split_dataset(samples, family="dsgps", variant="mixed")
    loader = GraphLoader(val[:n], batch_size=n, shuffle=False)
    return next(iter(loader))


def probe(params, cfg, graph):
    """Per-iteration |H| stats + enc loss through the k-unroll."""
    from psignn_tpu.models.dsgps import _dec_apply, _enc_apply, _step
    from psignn_tpu.ops import mse_masked

    ae = params["autoencoder"]
    H = _enc_apply(ae, graph.x) * graph.fnode_mask
    H0 = H
    neu = (graph.neumann_mask[:, 0] > 0) & (graph.node_mask > 0)
    interior = ((graph.neumann_mask[:, 0] == 0)
                & (graph.dirichlet_mask[:, 0] == 0) & (graph.node_mask > 0))
    rows = []
    for it in range(cfg.k):
        H = _step(params, cfg, graph, H, H0)
        U = _dec_apply(ae, H) * graph.fnode_mask
        enc = mse_masked(_enc_apply(ae, jax.lax.stop_gradient(U)),
                         jax.lax.stop_gradient(H), graph.node_mask)
        absH = jnp.abs(H).max(axis=-1)
        rows.append((it + 1,
                     float(jnp.max(jnp.where(neu, absH, 0.0))),
                     float(jnp.max(jnp.where(interior, absH, 0.0))),
                     float(enc)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="")
    ap.add_argument("--seed_scan", type=int, nargs=2, default=None,
                    metavar=("LO", "HI"))
    ap.add_argument("--neumann_init_scale", type=float, default=0.1)
    ap.add_argument("--n_graphs", type=int, default=20)
    args = ap.parse_args()

    from psignn_tpu.models.dsgps import DsgpsConfig, dsgps_init

    graph = build_batch(args.n_graphs)
    cfg = DsgpsConfig(bc_mode="mixed",
                      neumann_init_scale=args.neumann_init_scale)

    if args.ckpt:
        from psignn_tpu.train.checkpoint import load_checkpoint
        ckpt = load_checkpoint(args.ckpt)
        params = jax.tree.map(jnp.asarray, ckpt["params"])
        cfg = DsgpsConfig(**ckpt["hyperparameters"])
        print(f"# ckpt {args.ckpt} epoch={ckpt.get('epoch')}")
        print("iter  max|H|_neumann  max|H|_interior  enc_loss")
        for it, hn, hi, enc in probe(params, cfg, graph):
            print(f"{it:4d}  {hn:14.4e}  {hi:15.4e}  {enc:8.4e}")
        return

    lo, hi = args.seed_scan or (0, 20)
    print(f"# seed scan [{lo},{hi}) neumann_init_scale={args.neumann_init_scale}")
    print("seed  max|H|_neu_k30  max|H|_neu_k10  enc_k30    enc_k1   verdict")
    scored = []
    for seed in range(lo, hi):
        params = dsgps_init(jax.random.PRNGKey(seed), cfg)
        rows = probe(params, cfg, graph)
        hn30, enc30 = rows[-1][1], rows[-1][3]
        hn10, enc1 = rows[9][1], rows[0][3]
        verdict = "CONTRACTIVE" if hn30 <= rows[9][1] * 1.5 and hn30 < 50 \
            else ("bounded" if hn30 < 50 else "AMPLIFYING")
        scored.append((enc30, seed, verdict))
        print(f"{seed:4d}  {hn30:14.4e}  {hn10:14.4e}  {enc30:9.3e}"
              f"  {enc1:8.2e}  {verdict}")
    scored.sort()
    print("# best seeds by enc_k30:",
          [(s, f"{e:.2e}", v) for e, s, v in scored[:5]])


if __name__ == "__main__":
    main()
