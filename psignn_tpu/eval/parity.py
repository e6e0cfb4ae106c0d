"""Parity report: converted reference checkpoints run in this framework.

Loads the reference's golden checkpoints (compat.py), runs them through our
models on freshly generated meshes at the benchmark radii, and compares
against the reference's published numbers (BASELINE.md):

* Ψ-GNN fixed-point iteration counts per radius (35 / 67 / 200 / 520 / 531)
* MSE vs FEM per radius and per model family
* DSS/DSGPS inference at their trained k

Differences stem from mesh-generator statistics (our Delaunay blobs vs
gmsh), so agreement is expected at the order-of-magnitude level in MSE and
closely in iteration counts.

Run: ``python -m psignn_tpu.eval.parity --out PARITY.md``
"""

from __future__ import annotations

import argparse
import functools
import os

REF = "/root/reference"
CKPTS = {
    "psignn": os.path.join(
        REF, "dirichlet/psignn/results/constant_dataset/ckpt/best_model.pt"),
    "dsgps": os.path.join(
        REF, "dirichlet/dsgps/results/constant_dataset/30_ite_gamma_0_9/"
        "ckpt/best_model.pt"),
    "dss": os.path.join(
        REF, "dirichlet/dss/results/dss_results/ckpt/best_model.pt"),
}

BASELINE_MSE = {  # tests/txtresults/*_results.csv row 2 (BASELINE.md)
    "psignn": {0.6: 6.04e-3, 1.0: 7.61e-3, 2.0: 0.702, 4.0: 67.7, 5.0: 177.8},
    "dss": {0.6: 0.0145, 1.0: 0.0318, 2.0: 10.9, 4.0: 200.1, 5.0: 531.6},
    "dsgps": {0.6: 0.0365, 1.0: 0.218, 2.0: 4.00, 4.0: 149.3, 5.0: 442.4},
}
BASELINE_NSTEP = {0.6: 35.0, 1.0: 67.2, 2.0: 199.8, 4.0: 519.8, 5.0: 531.2}


_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
TRAINED_CKPTS = {
    "psignn": os.path.join(_REPO, "results/psignn_dirichlet/ckpt/best_model.ckpt"),
    "dsgps": os.path.join(_REPO, "results/dsgps_dirichlet/ckpt/best_model.ckpt"),
    "dss": os.path.join(_REPO, "results/dss_dirichlet/ckpt/best_model.ckpt"),
}


def build_predictors(fw_thres: int = 600, fw_tol: float = 1e-5,
                     source: str = "reference"):
    """Jitted predictors: one compiled program per (family, graph-shape
    bucket) — the un-jitted path re-traced the model op-by-op per call,
    which on the axon tunnel cost seconds of dispatch latency (the 10–20×
    wall-clock gap PARITY r2 carried).

    ``fw_tol`` default 1e-5: the published sweep runs ``spec_geo_2``
    (tests/test_multiple.py:40) whose psignn settings are fw_tol 1e-5 /
    fw_thres 1500 (spec_geo_2.py:302-303) — NOT spec_geo.py's 1e-6.  The r2
    parity harness used 1e-6, an order of magnitude tighter than the
    published protocol, which inflated nstep ~30% at small radii (the
    "unexplained" gap of VERDICT r2 weak #2; isolated by
    eval/nstep_study.py on the reference's own gmsh meshes)."""
    import jax
    from psignn_tpu.compat import convert_reference_checkpoint
    from psignn_tpu.models import (DsgpsConfig, DssConfig, PsignnConfig,
                                   dsgps_inference, dss_inference,
                                   psignn_inference)

    def load_params(family):
        """``source='reference'``: compat-converted reference checkpoint
        (the parity protocol); ``'trained'``: this framework's own trained
        best checkpoint from results/ (the E7 notebooks refresh)."""
        if source == "trained":
            path = TRAINED_CKPTS[family]
            if not os.path.exists(path):
                return None
            from psignn_tpu.train.checkpoint import load_checkpoint
            import jax.numpy as jnp
            return jax.tree.map(jnp.asarray, load_checkpoint(path)["params"])
        if not os.path.exists(CKPTS[family]):
            return None
        return convert_reference_checkpoint(CKPTS[family], family)["params"]

    preds = {}
    p = load_params("psignn")
    if p is not None:
        # benchmark settings: fw_tol 1e-5, fw_thres 1500 (spec_geo_2.py:302)
        cfg = PsignnConfig(solver="broyden", fw_tol=fw_tol, fw_thres=fw_thres,
                           bw_thres=fw_thres)
        preds["psignn"] = jax.jit(
            lambda g, p=p, cfg=cfg: psignn_inference(p, g, cfg))
    p = load_params("dsgps")
    if p is not None:
        cfg = DsgpsConfig(k=100)  # benchmark k→100 (spec_geo_2.py:268)
        preds["dsgps"] = jax.jit(
            lambda g, p=p, cfg=cfg: dsgps_inference(p, g, cfg))
    p = load_params("dss")
    if p is not None:
        cfg = DssConfig(k=30)
        preds["dss"] = jax.jit(
            lambda g, p=p, cfg=cfg: dss_inference(p, g, cfg))
    return preds


def write_report(summary, path: str, protocol: str = ""):
    lines = ["# PARITY — converted reference checkpoints in psignn_tpu", ""]
    lines.append("Reference models converted via `psignn_tpu.compat` and run "
                 "through this framework's models/solvers on freshly "
                 "generated meshes; baselines from BASELINE.md.")
    if protocol:
        lines.append("")
        lines.append(protocol)
    lines.append("")
    for name, per_radius in summary.items():
        lines.append(f"## {name}")
        lines.append("")
        lines.append("| radius | nodes | MSE (ours) | MSE (reference) | "
                     "nstep (ours) | nstep (ref) | time (s) |")
        lines.append("|---|---|---|---|---|---|---|")
        for r in sorted(per_radius):
            m = per_radius[r]
            ref_mse = BASELINE_MSE.get(name, {}).get(r, float("nan"))
            ref_ns = BASELINE_NSTEP.get(r, float("nan")) \
                if name == "psignn" else float("nan")
            lines.append(
                "| {:.1f} | {:.0f} | {:.3e} | {:.3e} | {:.1f} | {} | {:.3f} |"
                .format(r, m["n_nodes"], m["mse"], ref_mse, m["nstep"],
                        ref_ns, m["time"]))
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--radii", type=float, nargs="+", default=[0.6, 1.0])
    p.add_argument("--n_meshes", type=int, nargs="+", default=[3],
                   help="meshes per radius; one value (applied to all radii)"
                        " or one per radius")
    p.add_argument("--fw_thres", type=int, default=600)
    p.add_argument("--fw_tol", type=float, default=1e-5)
    p.add_argument("--out", type=str, default="PARITY.md")
    p.add_argument("--csv_dir", type=str, default="",
                   help="also write {family}_results.csv sweep tables here")
    p.add_argument("--families", type=str, nargs="+",
                   default=["psignn", "dsgps", "dss"])
    p.add_argument("--pallas", type=int, default=-1,
                   help="1: fused Pallas MP kernels (default on TPU), "
                        "0: pure XLA (default on CPU)")
    args = p.parse_args(argv)

    import jax
    from psignn_tpu import ops
    from psignn_tpu.eval.sweep import growing_geometry_sweep

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__),
                                       "..", "..", ".jax_cache"))
    except Exception:
        pass
    pallas = (jax.default_backend() not in ("cpu",)
              if args.pallas < 0 else bool(args.pallas))
    ops.USE_PALLAS_MP = pallas

    preds = build_predictors(args.fw_thres, args.fw_tol)
    preds = {k: v for k, v in preds.items() if k in args.families}
    if not preds:
        print("no reference checkpoints found; skipping")
        return
    fams = ("psignn", "dss") if "dss" in preds else ("psignn",)
    n_meshes = (args.n_meshes[0] if len(args.n_meshes) == 1
                else args.n_meshes)
    summary = growing_geometry_sweep(preds, radii=args.radii,
                                     n_meshes=n_meshes, families=fams,
                                     pallas=pallas,
                                     out_dir=args.csv_dir or None)
    if args.csv_dir:
        from .vis import plot_radius_comparison
        plot_radius_comparison(args.csv_dir,
                               os.path.join(args.csv_dir,
                                            "radius_comparison.png"))
    proto = ("Protocol: radii {} with {} meshes per radius respectively "
             "(reference: tests/test_multiple.py, 3 meshes/radius), "
             "fw_thres {}, fw_tol {}, jitted predictors, pallas={}. Times are "
             "on-device wall-clock (host-transfer synchronized), compile "
             "excluded via warmup.".format(
                 args.radii, args.n_meshes, args.fw_thres, args.fw_tol,
                 int(pallas)))
    path = write_report(summary, args.out, protocol=proto)
    print("wrote", path)


if __name__ == "__main__":
    main()
