"""Root-cause study for the small-radius nstep gap (VERDICT r2 weak #2).

PARITY r2 reported ~25-30% more fixed-point iterations than the reference's
published sweep at r=0.6/1.0 (43.6 vs 35.0, 89.5 vs 67.2) and attributed it
to mesh-generator statistics without isolating the claim.  This study does
the isolation: the converted reference checkpoint is evaluated with
identical solver settings on

* the reference's OWN gmsh-generated meshes (the checked-in DOLFIN-HDF5
  artifacts of ``tests/special_geo/build_mesh.py`` — the exact generator
  the published sweep used, ``tests/test_multiple.py:74-83``), and
* this framework's blob/circle meshes at the same radius,

with several RHS draws each.  If nstep on the gmsh meshes lands at the
published per-radius means (35/67.2, ``tests/txtresults/psignn_results.csv:7``)
while our meshes sit higher, the gap is the mesh distribution, not the
model/solver port.

Run: ``python -m psignn_tpu.eval.nstep_study --out docs/nstep_gap.md``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

REF_MESHES = {
    "gmsh_original_r1": ("/root/reference/tests/special_geo/mesh_files/"
                         "original/mesh.h5"),
    "gmsh_saved_r1": "/root/reference/tests/special_geo/saved_mesh/mesh.h5",
}


def eval_mesh(predict, mesh, radius: float, n_samples: int, seed: int,
              pallas: bool = False):
    """Mean nstep / MSE over ``n_samples`` RHS draws on one fixed mesh."""
    from ..data.fem import solve_poisson
    from ..data.reader import psignn_sample_from_fem
    from .metrics import errors_batch
    from .sweep import _batch_for_eval

    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_samples):
        s = psignn_sample_from_fem(solve_poisson(mesh, radius, rng))
        if pallas:
            from ..kernels import rcm_permutation
            from ..kernels.fused_mp import apply_node_permutation
            perm = rcm_permutation(s["senders"], s["receivers"],
                                   s["x"].shape[0])
            s = apply_node_permutation(s, perm)
        g = _batch_for_eval(s, pallas)
        u, nstep, lowest = predict(g)
        m = errors_batch(u, g)
        a_std = float(np.std(np.asarray(s["a_ij"])))
        rows.append(dict(nstep=int(nstep), lowest=float(lowest),
                         mse=float(np.asarray(m["mse"])[0]), a_std=a_std))
    out = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    out["nstep_std"] = float(np.std([r["nstep"] for r in rows]))
    out["n_nodes"] = mesh.n_points
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--fw_thres", type=int, default=600)
    p.add_argument("--fw_tol", type=float, default=1e-5)
    p.add_argument("--out", type=str, default="docs/nstep_gap.md")
    p.add_argument("--pallas", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    from ..data.meshgen import blob_mesh, circle_mesh, mesh_from_dolfin_h5
    from .parity import BASELINE_NSTEP, build_predictors

    preds = build_predictors(args.fw_thres, args.fw_tol)
    if "psignn" not in preds:
        print("reference psignn checkpoint not found; skipping")
        return
    predict = preds["psignn"]
    pallas = bool(args.pallas)

    results = {}
    for name, path in REF_MESHES.items():
        if os.path.exists(path):
            mesh = mesh_from_dolfin_h5(path)
            results[name] = eval_mesh(predict, mesh, 1.0, args.n_samples,
                                      seed=0, pallas=pallas)
    rng = np.random.default_rng(1)
    for i in range(3):
        results[f"ours_blob_r1_{i}"] = eval_mesh(
            predict, blob_mesh(radius=1.0, hsize=0.08, rng=rng), 1.0,
            args.n_samples, seed=10 + i, pallas=pallas)
    results["ours_circle_r1"] = eval_mesh(
        predict, circle_mesh(radius=1.0, hsize=0.08, seed=3), 1.0,
        args.n_samples, seed=20, pallas=pallas)

    lines = [
        "# nstep gap root-cause: reference gmsh meshes vs our generator",
        "",
        "Converted reference psignn checkpoint, identical solver settings "
        f"(broyden, fw_tol {args.fw_tol}, fw_thres {args.fw_thres} — the "
        "published protocol's spec_geo_2.py:302-303 values), "
        f"{args.n_samples} RHS draws per mesh.  Reference published mean "
        f"nstep at r=1.0: {BASELINE_NSTEP[1.0]} "
        "(tests/txtresults/psignn_results.csv:7).",
        "",
        "| mesh | nodes | nstep (mean ± std) | MSE | a_ij std |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append("| {} | {} | {:.1f} ± {:.1f} | {:.3e} | {:.4f} |".format(
            name, r["n_nodes"], r["nstep"], r["nstep_std"], r["mse"],
            r["a_std"]))
    lines.append("")
    gm = [r for k, r in results.items() if k.startswith("gmsh")]
    ours = [r for k, r in results.items() if k.startswith("ours")]
    if gm and ours:
        gm_n = float(np.mean([r["nstep"] for r in gm]))
        our_n = float(np.mean([r["nstep"] for r in ours]))
        lines.append(
            "Mean nstep on the reference's own gmsh meshes: {:.1f}; on our "
            "generator: {:.1f}; published reference mean: {:.1f}.".format(
                gm_n, our_n, BASELINE_NSTEP[1.0]))
        lines.append("")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)
    for name, r in results.items():
        print(name, r)


if __name__ == "__main__":
    main()
