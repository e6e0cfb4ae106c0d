"""Training-curve parity: our runs vs the reference's checked-in logs.

Parses ``train_metrics.csv`` logs (both frameworks write the same
line-oriented format, e.g. ``Validation Epoch 12 :  Train : ...  Res :
...``; reference format at dirichlet/dss/results/dss_results/logs/
train_metrics.csv) and reports the validation residual at matched epochs,
plus a log-scale overlay plot.

Run:
  python -m psignn_tpu.eval.curves \
      --ours results/dss_dirichlet/logs/train_metrics.csv \
      --ref /root/reference/dirichlet/dss/results/dss_results/logs/train_metrics.csv \
      --label dss --out docs/curves_dss.md --plot docs/curves_dss.png
"""

from __future__ import annotations

import argparse
import os
import re

_VAL = re.compile(
    r"Validation Epoch (\d+) :.*?Res : ([0-9.eE+-]+).*?MSE : ([0-9.eE+-]+)")
_EPOCH_TIME = re.compile(
    r"Training Epoch (\d+) finished, took current epoch ([0-9.]+)s")


def parse_val(path: str):
    """{epoch: (val_res, val_mse)} from a train_metrics log."""
    out = {}
    with open(path) as f:
        for line in f:
            m = _VAL.search(line)
            if m:
                out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def parse_epoch_times(path: str):
    out = {}
    with open(path) as f:
        for line in f:
            m = _EPOCH_TIME.search(line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


def compare(ours: str, ref: str, checkpoints=(0, 1, 5, 10, 25, 50, 100,
                                              200, 399)):
    ov, rv = parse_val(ours), parse_val(ref)
    rows = []
    last = max(ov) if ov else -1
    for e in checkpoints:
        ee = e if e in ov else (last if e > last else None)
        if ee is None or e not in rv:
            continue
        o_res, o_mse = ov[ee]
        r_res, r_mse = rv[e]
        rows.append((e, ee, o_res, r_res, o_res / r_res, o_mse, r_mse))
    return rows, ov, rv


def write_report(rows, ov, rv, label, out_path, times=None):
    lines = [f"# Training-curve parity — {label}", ""]
    if times:
        vals = list(times.values())[1:] or list(times.values())
        lines.append(f"Epoch time (steady state): "
                     f"{sum(vals) / max(1, len(vals)):.1f}s/epoch "
                     f"on 1 TPU v5e chip.")
        lines.append("")
    lines.append("| epoch (ref) | epoch (ours) | val Res (ours) | "
                 "val Res (ref) | ratio | val MSE (ours) | val MSE (ref) |")
    lines.append("|---|---|---|---|---|---|---|")
    for e, ee, o, r, ratio, om, rm in rows:
        lines.append(f"| {e} | {ee} | {o:.3e} | {r:.3e} | {ratio:.2f}x | "
                     f"{om:.3e} | {rm:.3e} |")
    lines.append("")
    lines.append(f"Ours trained to epoch {max(ov)}; "
                 f"reference log covers epochs 0–{max(rv)}.")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def plot(ov, rv, label, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for vals, name, color in ((ov, "psignn_tpu (1 TPU v5e)", "#2a7de1"),
                              (rv, "reference (2 GPUs)", "#b3b9c4")):
        es = sorted(vals)
        ax.plot(es, [vals[e][0] for e in es], label=name, color=color)
    ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_ylabel("validation residual")
    ax.set_title(f"{label}: validation residual vs reference")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--label", default="run")
    p.add_argument("--out", default=None)
    p.add_argument("--plot", default=None)
    args = p.parse_args(argv)

    rows, ov, rv = compare(args.ours, args.ref)
    times = parse_epoch_times(args.ours)
    for e, ee, o, r, ratio, om, rm in rows:
        print(f"epoch {e} (ours {ee}): val res {o:.3e} vs ref {r:.3e} "
              f"({ratio:.2f}x)")
    if args.out:
        print("wrote", write_report(rows, ov, rv, args.label, args.out,
                                    times))
    if args.plot:
        print("wrote", plot(ov, rv, args.label, args.plot))


if __name__ == "__main__":
    main()
