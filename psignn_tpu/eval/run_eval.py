"""Checkpoint evaluation CLI — the analog of the per-model ``test/`` runners.

Mirrors ``dirichlet/psignn/test/test_func.py:163-186`` /
``dirichlet/dsgps/test/test.py``: load a checkpoint, sweep the test split,
print the metrics table, and optionally run the growing-geometry sweep and
write visualization maps.

    python -m psignn_tpu.eval.run_eval --ckpt results/ckpt/best_model.ckpt \
        --path_dataset data/ --sweep --out results/eval/
"""

from __future__ import annotations

import argparse
import json
import os


def load_predictor(ckpt_path: str):
    """Build (predict_fn, family, cfg, params) from a trainer checkpoint."""
    import jax
    from psignn_tpu.models import (DsgpsConfig, DssConfig, PsignnConfig,
                                   dsgps_inference, dss_inference,
                                   psignn_inference)
    from psignn_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    family = ckpt["family"]
    hp = ckpt["hyperparameters"]
    params = jax.tree.map(lambda x: x, ckpt["params"])
    if family == "psignn":
        cfg = PsignnConfig(**hp)
        predict = jax.jit(lambda g: psignn_inference(params, g, cfg))
    elif family == "dsgps":
        cfg = DsgpsConfig(**hp)
        predict = jax.jit(lambda g: dsgps_inference(params, g, cfg))
    else:
        cfg = DssConfig(**hp)
        predict = jax.jit(lambda g: dss_inference(params, g, cfg))
    return predict, family, cfg, params


def main(argv=None):
    p = argparse.ArgumentParser(description="psignn_tpu checkpoint eval")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--path_dataset", type=str, default="data/")
    p.add_argument("--variant", type=str, default="dirichlet",
                   choices=["dirichlet", "mixed"])
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--sweep", action="store_true",
                   help="also run the growing-geometry radius sweep")
    p.add_argument("--zoo", action="store_true",
                   help="also run the OOD geometry-zoo evaluation")
    p.add_argument("--radii", type=float, nargs="+",
                   default=[0.6, 1.0, 2.0, 4.0, 5.0])
    p.add_argument("--n_meshes", type=int, default=3)
    p.add_argument("--pallas", type=int, default=-1,
                   help="1: fused Pallas MP kernels (default on TPU), "
                        "0: pure XLA (default on CPU)")
    args = p.parse_args(argv)

    import jax
    from psignn_tpu import ops
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__),
                                       "..", "..", ".jax_cache"))
    except Exception:
        pass
    pallas = (jax.default_backend() not in ("cpu",)
              if args.pallas < 0 else bool(args.pallas))
    ops.USE_PALLAS_MP = pallas

    from psignn_tpu.data.reader import GraphLoader, load_dataset, split_dataset
    from psignn_tpu.eval.metrics import evaluate_dataset
    from psignn_tpu.eval.sweep import growing_geometry_sweep

    predict, family, cfg, params = load_predictor(args.ckpt)

    samples = load_dataset(args.path_dataset, family=family,
                           variant=args.variant)
    _, _, test = split_dataset(samples, family=family, variant=args.variant)
    loader = GraphLoader(test, batch_size=args.batch_size)

    def u_only(g):
        out = predict(g)
        return out[0] if isinstance(out, tuple) else out

    results = evaluate_dataset(u_only, loader, name=family)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "test_metrics.json"), "w") as f:
            json.dump(results, f, indent=2)

    fams = ("psignn", "dss") if family == "dss" else ("psignn",)
    if args.sweep:
        summary = growing_geometry_sweep(
            {family: predict}, radii=args.radii, n_meshes=args.n_meshes,
            out_dir=args.out or None, families=fams, pallas=pallas)
        print(json.dumps(summary, indent=2, default=float))

    if args.zoo:
        from psignn_tpu.eval.sweep import geometry_zoo_eval
        zoo = geometry_zoo_eval({family: predict}, families=fams,
                                pallas=pallas)
        print(json.dumps(zoo, indent=2, default=float))
        if args.out:
            with open(os.path.join(args.out, "geometry_zoo.json"), "w") as f:
                json.dump(zoo, f, indent=2, default=float)


if __name__ == "__main__":
    main()
