"""Unified training CLI covering all six reference configurations.

Replaces the six per-model ``main.py`` + argparse copies
(``*/{psignn,dsgps,dss}/main.py``, ``*/utilities/utils.py:11-78``) with one
entry point::

    python -m psignn_tpu.cli.main --family psignn --variant dirichlet \
        --path_dataset data/ --solver broyden --fw_tol 1e-5 --fw_thres 500 \
        --lr_deq 0.01 --lr_ae 0.05 --jac_weight 1.0 --batch_size 50

Canonical reference hyperparameters (SURVEY.md §6): psignn — latent_dim 10,
n_layers 1, broyden, fw_tol 1e-5, fw_thres 400-500, bw_tol 1e-8, lr_deq 0.01,
lr_ae 0.05, grad clip 0.1, jac_weight 1.0, batch 50; dsgps/dss — k 30,
alpha 1e-3, gamma 0.9, lr 0.01, grad clip 0.01.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="psignn_tpu unified trainer")
    p.add_argument("--family", type=str, default="psignn",
                   choices=["psignn", "dsgps", "dss"])
    p.add_argument("--variant", type=str, default="dirichlet",
                   choices=["dirichlet", "mixed"])
    # paths
    p.add_argument("--path_dataset", type=str, default="dataset/")
    p.add_argument("--path_results", type=str, default="results/")
    p.add_argument("--comment", type=str, default="")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint path to resume from")
    # training
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--max_epochs", type=int, default=500)
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--min_loss_save", type=float, default=1e10)
    p.add_argument("--gradient_clip", type=float, default=None,
                   help="default: canonical per family (psignn 0.1, "
                        "dsgps/dss 0.01)")
    p.add_argument("--stats", type=str, default="reference",
                   choices=["reference", "auto"])
    # optimizers
    p.add_argument("--lr", type=float, default=0.01, help="dsgps/dss lr")
    p.add_argument("--lr_deq", type=float, default=0.01)
    p.add_argument("--sched_step_deq", type=float, default=0.5)
    p.add_argument("--lr_ae", type=float, default=0.05)
    p.add_argument("--sched_step_ae", type=float, default=0.5)
    # solver / DEQ (psignn)
    p.add_argument("--solver", type=str, default="broyden",
                   choices=["broyden", "forward_iteration", "anderson",
                            "newton", "newton_krylov"])
    p.add_argument("--jac_weight", type=float, default=1.0)
    p.add_argument("--latent_dim", type=int, default=10)
    p.add_argument("--n_layers", type=int, default=1)
    p.add_argument("--fw_tol", type=float, default=1e-5)
    p.add_argument("--fw_thres", type=int, default=500)
    p.add_argument("--bw_tol", type=float, default=1e-8)
    p.add_argument("--bw_thres", type=int, default=500)
    # unrolled models (dsgps/dss)
    p.add_argument("--k", type=int, default=30)
    p.add_argument("--alpha", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.9)
    # data-parallel
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard_map data parallelism when > 1; 0 = all local devices")
    # TPU kernel path
    p.add_argument("--rcm", action="store_true",
                   help="RCM-permute each sample (small kernel windows)")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas message-passing kernels (implies --rcm)")
    p.add_argument("--lowrank_bf16", action="store_true",
                   help="EXPERIMENTAL: bfloat16 Broyden rank-1 factors (f32 "
                        "accumulate). Halves late-iteration HBM traffic but "
                        "can trip the divergence protection on large meshes "
                        "(docs/PERF.md); not used by canonical configs")
    p.add_argument("--broyden_ls", action="store_true",
                   help="Armijo line search inside broyden steps "
                        "(reference broyden(..., ls=True))")
    p.add_argument("--lowrank_max_rank", type=int, default=0,
                   help="cap Broyden's low-rank memory at this many rank-1 "
                        "pairs (ring overwrite, L-BFGS style); bounds the "
                        "per-iteration rank-op HBM traffic. 0 = full memory "
                        "(reference semantics)")
    p.add_argument("--enc_loss_mode", type=str, default="",
                   choices=["", "freeze", "detach"],
                   help="dsgps only: override the per-variant enc/autoenc "
                        "loss gradient-routing semantics (dirichlet "
                        "reference: freeze, mixed reference: detach); see "
                        "DsgpsConfig.enc_loss_override")
    p.add_argument("--neumann_init_scale", type=float, default=1.0,
                   help="mixed dsgps: scale update_neumann's output layer "
                        "at init (1.0 = reference Xavier; ~0.1 starts the "
                        "ungated Neumann recurrence contractive - every "
                        "Xavier seed amplifies on this dataset, "
                        "docs/dsgps_dynamics.md)")
    p.add_argument("--spike_guard", action="store_true",
                   help="training-level failure protection: on a sustained "
                        "val-residual spike (> spike_factor x best for "
                        "spike_patience epochs), reload the best checkpoint "
                        "and halve the effective lr")
    p.add_argument("--spike_factor", type=float, default=3.0)
    p.add_argument("--spike_patience", type=int, default=2)
    p.add_argument("--val_sradius", type=int, default=1,
                   help="power-method spectral radius during validation "
                        "(psignn; 150 VJPs per val batch, as the reference)")
    p.add_argument("--stacked_batch", action="store_true",
                   help="psignn: vmapped per-graph DEQ solves — each mesh "
                        "stops at its own tolerance instead of the "
                        "reference's joint batch norm (single-device only)")
    p.add_argument("--cache_batches", type=int, default=0,
                   help="opt-in perf mode: pre-build batches and keep them "
                        "on device (epochs reshuffle batch ORDER, not "
                        "membership — the reference re-deals samples to "
                        "batches every epoch, so leave off for parity runs)")
    return p


def build_model_cfg(args):
    from psignn_tpu.models import DsgpsConfig, DssConfig, PsignnConfig
    if args.family == "psignn":
        return PsignnConfig(latent_dim=args.latent_dim, n_layers=args.n_layers,
                            bc_mode=args.variant, solver=args.solver,
                            fw_tol=args.fw_tol, fw_thres=args.fw_thres,
                            bw_tol=args.bw_tol, bw_thres=args.bw_thres,
                            lowrank_bf16=args.lowrank_bf16,
                            lowrank_max_rank=args.lowrank_max_rank,
                            ls=args.broyden_ls)
    if args.family == "dsgps":
        return DsgpsConfig(latent_dim=args.latent_dim, k=args.k,
                           gamma=args.gamma, bc_mode=args.variant,
                           neumann_init_scale=args.neumann_init_scale,
                           enc_loss_override=args.enc_loss_mode)
    return DssConfig(latent_dim=args.latent_dim, k=args.k, alpha=args.alpha,
                     gamma=args.gamma)


def main(argv=None):
    args = get_parser().parse_args(argv)

    # persistent compile cache (first Mosaic/XLA compile of a training step
    # is minutes; restarts and resumes should not pay it again)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.getcwd(), ".jax_cache"))
    except Exception:
        pass

    from psignn_tpu.data.reader import GraphLoader, load_dataset, split_dataset
    from psignn_tpu.train import Trainer, TrainConfig

    if os.path.exists(args.path_results) and not args.resume:
        shutil.rmtree(args.path_results)
    os.makedirs(args.path_results, exist_ok=True)

    # Register this trainer's PID so bench.py can SIGSTOP/SIGCONT it while
    # measuring: the single chip is shared by every process on this host, and
    # a live training run alongside the benchmark skews the measurement ~5x
    # (BENCH_r03 regression).  Exact-PID + /proc cmdline verification on the
    # bench side; removed on clean exit.
    pidfile = os.path.join(args.path_results, "trainer.pid")
    with open(pidfile, "w") as fh:
        fh.write(str(os.getpid()))
    import atexit
    atexit.register(lambda: os.path.exists(pidfile) and os.remove(pidfile))

    # Relaunch recipe for scripts/train_watchdog.sh: the axon tunnel
    # occasionally deadlocks a long-running trainer mid-dispatch (zero CPU,
    # no log progress — observed twice in round 4); the watchdog kills the
    # recorded PID and re-runs this command, which resumes from
    # running_model.ckpt.
    import sys as _sys
    argv_now = list(argv) if argv is not None else _sys.argv[1:]
    resume_argv = [a for i, a in enumerate(argv_now)
                   if a != "--resume" and (i == 0 or argv_now[i - 1] != "--resume")]
    resume_argv += ["--resume",
                    os.path.join(args.path_results, "ckpt", "running_model.ckpt")]
    import shlex
    with open(os.path.join(args.path_results, "relaunch.cmd"), "w") as fh:
        # shlex-quoted: the watchdog re-executes this via `bash -c`, so any
        # argument with spaces/metacharacters must survive re-parsing
        # (round-4 advisor finding).
        fh.write(" ".join(shlex.quote(a) for a in
                          [_sys.executable, "-m", "psignn_tpu.cli.main"]
                          + resume_argv))

    dtype = {"float32": np.float32, "bfloat16": "bfloat16"}[args.precision]
    if dtype == "bfloat16":
        import jax.numpy as jnp
        dtype = jnp.bfloat16
    samples = load_dataset(args.path_dataset, family=args.family,
                           variant=args.variant, stats=args.stats,
                           dtype=dtype)
    train, val, test = split_dataset(samples, family=args.family,
                                     variant=args.variant, seed=args.seed)
    if args.pallas:
        os.environ["PSIGNN_TPU_PALLAS"] = "1"
        from psignn_tpu import ops
        ops.USE_PALLAS_MP = True
    rcm = args.rcm or args.pallas
    n_dev = args.num_devices
    if n_dev == 0:
        import jax
        n_dev = jax.device_count()
    dp = n_dev > 1
    stacked = bool(args.stacked_batch) and args.family == "psignn"
    if stacked and dp:
        raise SystemExit("--stacked_batch is mutually exclusive with "
                         "multi-device data parallelism")
    loader_train = GraphLoader(train, batch_size=args.batch_size,
                               shuffle=True, seed=args.seed, rcm=rcm,
                               pack_kernel_blocks=args.pallas,
                               cache_batches=bool(args.cache_batches),
                               n_devices=n_dev if dp else 0,
                               stacked=stacked)
    loader_val = GraphLoader(val, batch_size=args.batch_size, rcm=rcm,
                             pack_kernel_blocks=args.pallas,
                             cache_batches=bool(args.cache_batches),
                             n_devices=n_dev if dp else 0,
                             stacked=stacked)

    clip = args.gradient_clip
    if clip is None:
        # canonical per-family values (launch_slurm.sh / launch.sh)
        clip = 0.1 if args.family == "psignn" else 0.01
    cfg = TrainConfig(
        family=args.family, model_cfg=build_model_cfg(args),
        max_epochs=args.max_epochs, lr=args.lr, lr_deq=args.lr_deq,
        lr_ae=args.lr_ae, sched_step_deq=args.sched_step_deq,
        sched_step_ae=args.sched_step_ae, gradient_clip=clip,
        jac_weight=args.jac_weight, min_loss_save=args.min_loss_save,
        path_results=args.path_results, seed=args.seed, data_parallel=dp,
        val_sradius=bool(args.val_sradius), stacked_batch=stacked,
        spike_guard=bool(args.spike_guard), spike_factor=args.spike_factor,
        spike_patience=args.spike_patience)

    trainer = Trainer(cfg, loader_train, loader_val)
    if args.resume:
        trainer.load_model(args.resume)
    trainer.train_model()
    print("Training finished")


if __name__ == "__main__":
    main()
