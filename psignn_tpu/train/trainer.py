"""Experiment driver: jitted train/val steps, CSV metrics, checkpoints.

Re-designs the three reference trainers (``*/training_class.py``, ~900 LoC of
near-copies) as one family-parameterized Trainer:

* psignn: two Adam optimizers over the DEQ vs autoencoder partitions with
  ReduceLROnPlateau schedulers (training_class.py:52-58), loss = residual +
  jac_weight·jacobian + encoder + autoencoder (training_class.py:156-159),
  LR-floor early stop at 1e-7 (training_class.py:291-294)
* dsgps/dss: single Adam, no scheduler, loss = train_loss
  (dsgps/training_class.py:49-51,144)
* shared: global-norm grad clip, intra-epoch CSV logs at 25/50/75 %
  (training_class.py:185-200), per-epoch val loop, running/best/final
  checkpoints keyed on val residual (training_class.py:296-333), loss and
  gradient plots every 2 epochs (training_class.py:328-330), DEQ
  forward/backward iteration and spectral-radius CSV logs (§5.5).
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (DsgpsConfig, DssConfig, PsignnConfig, dsgps_forward,
                      dsgps_init, dss_forward, dss_init, psignn_forward,
                      psignn_init)
from .checkpoint import load_checkpoint, save_checkpoint
from .optim import PlateauScheduler, adam_update, clip_by_global_norm, init_adam

LOSS_KEYS = ["loss", "residual_loss", "jacobian_loss", "encoder_loss",
             "autoencoder_loss", "mse_loss"]


@dataclasses.dataclass
class TrainConfig:
    family: str = "psignn"                  # 'psignn' | 'dsgps' | 'dss'
    model_cfg: Any = None
    max_epochs: int = 500
    lr: float = 0.01                        # dsgps/dss single optimizer
    lr_deq: float = 0.01
    lr_ae: float = 0.05
    sched_step_deq: float = 0.5
    sched_step_ae: float = 0.5
    gradient_clip: float = 0.1
    jac_weight: float = 1.0
    min_loss_save: float = 1e10
    path_results: str = "results/"
    seed: int = 1234
    plot_every: int = 2
    val_sradius: bool = True
    lr_floor: float = 1e-7
    # shard_map data parallelism over the device mesh; requires loaders
    # built with GraphLoader(n_devices=N) so batches arrive stacked
    data_parallel: bool = False
    # psignn only: per-graph adaptive DEQ stopping via the vmapped
    # psignn_forward_stacked; requires GraphLoader(stacked=True) batches.
    # Replaces the reference's joint-batch residual norm with one stopping
    # test per mesh (SURVEY.md hard-part #1); mutually exclusive with
    # data_parallel.
    stacked_batch: bool = False
    # Opt-in training-level failure protection (the trainer analog of the
    # solvers' divergence breaks, SURVEY.md §5.3): when val residual exceeds
    # spike_factor x the best seen for spike_patience consecutive epochs,
    # reload the best checkpoint (params + optimizer state) and halve the
    # effective lr.  Off by default — the reference has no such guard — but
    # the k-unrolled dsgps recurrence repeatedly destabilises at the
    # recorded lr on this dataset realization (docs/dsgps_dynamics.md) and
    # never recovers on its own.
    spike_guard: bool = False
    spike_factor: float = 3.0
    spike_patience: int = 2


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


class Trainer:

    def __init__(self, config: TrainConfig, loader_train, loader_val,
                 params=None):
        self.c = config
        self.loader_train = loader_train
        self.loader_val = loader_val
        self.family = config.family
        self.mc = config.model_cfg or self._default_cfg()

        self.path_ckpt = os.path.join(config.path_results, "ckpt")
        self.path_logs = os.path.join(config.path_results, "logs")
        os.makedirs(self.path_ckpt, exist_ok=True)
        os.makedirs(self.path_logs, exist_ok=True)
        self._init_log_files()

        key = jax.random.PRNGKey(config.seed)
        if params is None:
            params = self._init_params(key)
        self.params = params

        if self.family == "psignn":
            self.opt_state = {
                "deq": init_adam(self.params["function"]),
                "ae": init_adam(self.params["autoencoder"]),
            }
            self.sched_deq = PlateauScheduler(config.lr_deq, config.sched_step_deq)
            self.sched_ae = PlateauScheduler(config.lr_ae, config.sched_step_ae)
        else:
            self.opt_state = init_adam(self.params)

        self.hist_train = {k: [] for k in LOSS_KEYS}
        self.hist_val = {k: [] for k in LOSS_KEYS}
        self.min_loss_save = config.min_loss_save
        self.lr_scale = 1.0          # halved by the spike guard
        self._spike_count = 0
        self.training_time = 0.0
        self._rng = jax.random.PRNGKey(config.seed + 1)
        self._last_grad_norms: Dict[str, float] = {}

        self._build_steps()
        self._dump_model_config()

    # ------------------------------------------------------------------ setup

    def _default_cfg(self):
        return {"psignn": PsignnConfig(), "dsgps": DsgpsConfig(),
                "dss": DssConfig()}[self.family]

    def _init_params(self, key):
        init = {"psignn": psignn_init, "dsgps": dsgps_init,
                "dss": dss_init}[self.family]
        return init(key, self.mc)

    def _init_log_files(self):
        for name, header in [("train_metrics.csv", "Train Metrics"),
                             ("forward_iteration.csv", "Residual \t Iterations"),
                             ("backward_iteration.csv", "Residual \t Iterations"),
                             ("spectral_radius.csv", "Spectral Radius")]:
            p = os.path.join(self.path_logs, name)
            if not os.path.exists(p):
                with open(p, "a") as f:
                    f.write(header)

    def _dump_model_config(self):
        n_devices = jax.device_count()
        with open(os.path.join(self.path_logs, "model_config.csv"), "w") as f:
            f.write(f"Number of devices used : {n_devices} \n\n")
            f.write("Includes {} train samples, {} val samples \n".format(
                len(self.loader_train.samples), len(self.loader_val.samples)))
            f.write(f"Batch size {self.loader_train.batch_size} \n\n")
            f.write("Model configuration : \n{\n")
            for fld in dataclasses.fields(self.mc):
                f.write(f"'{fld.name}':'{getattr(self.mc, fld.name)}'\n")
            f.write("}\n\nTraining configuration : \n{\n")
            for fld in dataclasses.fields(self.c):
                if fld.name == "model_cfg":
                    continue
                f.write(f"'{fld.name}':'{getattr(self.c, fld.name)}'\n")
            f.write("}\n\n")
            f.write(f"Number of parameters : {count_params(self.params)} \n")

    # ------------------------------------------------------------ step builds

    def _loss_and_aux(self, params, graph, rng, training, bw_sink=None):
        if self.family == "psignn":
            if self.c.stacked_batch:
                from ..models import psignn_forward_stacked
                out = psignn_forward_stacked(params, graph, self.mc, rng,
                                             training=training,
                                             bw_sink=bw_sink)
                l = out.losses
                loss = (l["residual_loss"]
                        + self.c.jac_weight * l["jacobian_loss"]
                        + l["encoder_loss"] + l["autoencoder_loss"])
                return loss, {k: v for k, v in l.items()
                              if k != "fw_nstep_per_graph"}
            out = psignn_forward(params, graph, self.mc, rng,
                                 training=training, bw_sink=bw_sink)
            l = out.losses
            loss = (l["residual_loss"] + self.c.jac_weight * l["jacobian_loss"]
                    + l["encoder_loss"] + l["autoencoder_loss"])
            return loss, l
        if self.family == "dsgps":
            out = dsgps_forward(params, graph, self.mc)
            return out.losses["train_loss"], out.losses
        out = dss_forward(params, graph, self.mc)
        return out.losses["train_loss"], out.losses

    def _build_steps(self):
        clip = self.c.gradient_clip

        if self.c.data_parallel:
            from ..dist import dp_value_and_grad, make_mesh
            n_dev = getattr(self.loader_train, "n_devices", 0) or \
                jax.device_count()
            mesh = make_mesh(n_dev)

            if self.family == "psignn":
                # sink_dim=2 threads the DEQ backward-stats gradient sink
                # through each shard so backward_iteration.csv keeps logging
                # under --data_parallel (round-4 advisor finding).
                vag = dp_value_and_grad(
                    lambda p, g, r, s: self._loss_and_aux(p, g, r, True,
                                                          bw_sink=s),
                    mesh, sink_dim=2)

                def train_step(params, opt_state, graph, rng, lr_deq, lr_ae):
                    loss, aux, grads, gsink = vag(params, graph, rng)
                    aux = dict(aux)
                    aux["bw_lowest"], aux["bw_nstep"] = gsink[0], gsink[1]
                    grads, gnorm = clip_by_global_norm(grads, clip)
                    pf, sd = adam_update(grads["function"], opt_state["deq"],
                                         params["function"], lr_deq)
                    pa, sa = adam_update(grads["autoencoder"],
                                         opt_state["ae"],
                                         params["autoencoder"], lr_ae)
                    return ({"function": pf, "autoencoder": pa},
                            {"deq": sd, "ae": sa}, loss, aux, gnorm, grads)
            else:
                vag = dp_value_and_grad(
                    lambda p, g, r: self._loss_and_aux(p, g, r, True), mesh)
                def train_step(params, opt_state, graph, rng, lr_deq, lr_ae):
                    del lr_ae
                    loss, aux, grads = vag(params, graph, rng)
                    grads, gnorm = clip_by_global_norm(grads, clip)
                    params, opt_state = adam_update(grads, opt_state, params,
                                                    lr_deq)
                    return params, opt_state, loss, aux, gnorm, grads

            def val_step(params, graph, rng):
                # validate across ALL shards (pmean'd), mirroring dp_loss —
                # val loss drives the schedulers/early-stop/best-checkpoint
                # decisions, so it must see the full validation set
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def local(p, g_stacked, r):
                    g = jax.tree.map(
                        lambda x: x.reshape(x.shape[1:]) if x.ndim > 0 else x,
                        g_stacked)
                    r = jax.random.fold_in(r, jax.lax.axis_index("dp"))
                    loss, aux = self._loss_and_aux(p, g, r,
                                                   not self.c.val_sradius)
                    loss = jax.lax.pmean(loss, "dp")
                    aux = jax.tree.map(lambda a: jax.lax.pmean(a, "dp"), aux)
                    return loss, aux

                return shard_map(local, mesh=mesh,
                                 in_specs=(P(), P("dp"), P()),
                                 out_specs=(P(), P()),
                                 check_vma=False)(params, graph, rng)

            self._train_step = jax.jit(train_step)
            self._val_step = jax.jit(val_step)
            return

        if self.family == "psignn":
            def train_step(params, opt_state, graph, rng, lr_deq, lr_ae):
                # bw_sink: one (2,) per backward solve — the stacked batch
                # runs one vmapped solve per graph.  Its loss-"gradient"
                # carries the backward adjoint solve's (lowest, nstep),
                # which no host callback can deliver on the axon tunnel
                # (reference logs these from its autograd hook,
                # model.py:219-221).
                if self.c.stacked_batch:
                    sink0 = jnp.zeros((graph.x.shape[0], 2), jnp.float32)
                else:
                    sink0 = jnp.zeros(2, jnp.float32)
                (loss, aux), (grads, gsink) = jax.value_and_grad(
                    lambda p, s: self._loss_and_aux(p, graph, rng, True,
                                                    bw_sink=s),
                    argnums=(0, 1), has_aux=True)(params, sink0)
                gsink = gsink.reshape(-1, 2).mean(axis=0)
                aux = dict(aux)
                aux["bw_lowest"], aux["bw_nstep"] = gsink[0], gsink[1]
                grads, gnorm = clip_by_global_norm(grads, clip)
                pf, sd = adam_update(grads["function"], opt_state["deq"],
                                     params["function"], lr_deq)
                pa, sa = adam_update(grads["autoencoder"], opt_state["ae"],
                                     params["autoencoder"], lr_ae)
                new_params = {"function": pf, "autoencoder": pa}
                return new_params, {"deq": sd, "ae": sa}, loss, aux, gnorm, grads
        else:
            def train_step(params, opt_state, graph, rng, lr_deq, lr_ae):
                del lr_ae
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: self._loss_and_aux(p, graph, rng, True),
                    has_aux=True)(params)
                grads, gnorm = clip_by_global_norm(grads, clip)
                params, opt_state = adam_update(grads, opt_state, params, lr_deq)
                return params, opt_state, loss, aux, gnorm, grads

        def val_step(params, graph, rng):
            return self._loss_and_aux(params, graph, rng, not self.c.val_sradius)

        self._train_step = jax.jit(train_step)
        self._val_step = jax.jit(val_step)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # -------------------------------------------------------------- epoch ops

    def train_loop(self, epoch: int):
        c = self.c
        accum = {k: 0.0 for k in LOSS_KEYS}
        n_batches = len(self.loader_train)
        # lr_scale (spike guard) applies to BOTH families: the psignn
        # schedulers' lrs are scaled too, so the guard's halving is never a
        # silent no-op (round-4 advisor finding).
        lr1 = (self.sched_deq.lr if self.family == "psignn"
               else c.lr) * self.lr_scale
        lr2 = (self.sched_ae.lr * self.lr_scale
               if self.family == "psignn" else 0.0)
        marks = {math.ceil(f * n_batches) for f in (0.25, 0.5, 0.75)}

        # Device-side metric buffers, fetched only at the 25/50/75 % marks
        # and epoch end — per-batch scalar fetches each pay a full tunnel
        # round trip and stall the dispatch pipeline.
        pending = []          # list of (metric_vec, fw_vec|None)

        def flush():
            if not pending:
                return {k: 0.0 for k in LOSS_KEYS}, 0
            vecs = np.asarray(jnp.stack([p[0] for p in pending]))
            for idx, csv in ((1, "forward_iteration.csv"),
                             (2, "backward_iteration.csv")):
                rows = [p[idx] for p in pending if p[idx] is not None]
                if rows:
                    host = np.asarray(jnp.stack(rows))
                    with open(os.path.join(self.path_logs, csv), "a") as f:
                        for lo, ns in host:
                            f.write("\n{} \t {}".format(float(lo), int(ns)))
            sums = vecs.sum(axis=0)
            n = len(pending)
            pending.clear()
            return {k: float(v) for k, v in zip(LOSS_KEYS, sums)}, n

        from ..data.reader import prefetch
        for i, graph in enumerate(prefetch(iter(self.loader_train))):
            rng = self._next_rng()
            self.params, self.opt_state, loss, aux, gnorm, grads = \
                self._train_step(self.params, self.opt_state, graph, rng,
                                 lr1, lr2)
            vec = jnp.stack([loss] + [aux.get(k, jnp.zeros(()))
                                      for k in LOSS_KEYS[1:]])
            fw = (jnp.stack([aux["fw_lowest"], aux["fw_nstep"]])
                  if "fw_lowest" in aux else None)
            bw = (jnp.stack([aux["bw_lowest"], aux["bw_nstep"]])
                  if "bw_lowest" in aux else None)
            pending.append((vec, fw, bw))
            if i in marks:
                run, cumul = flush()
                for k in LOSS_KEYS:
                    accum[k] += run[k]
                with open(os.path.join(self.path_logs,
                                       "train_metrics.csv"), "a") as f:
                    f.write("\nEpoch {}, {:d}% \t Loss : {:.4e} \t Res : {:.4e}"
                            " \t Jac : {:.4e} \t Enc : {:.4e} \t AEnc : {:.4e}"
                            " \t MSE : {:.4e}".format(
                                epoch, int(i * 100 / n_batches),
                                *(run[k] / max(cumul, 1) for k in LOSS_KEYS)))
        run, _ = flush()
        for k in LOSS_KEYS:
            accum[k] += run[k]
        self._last_grad_norms = {
            "/".join(str(p) for p in path): float(jnp.linalg.norm(g.reshape(-1)))
            for path, g in _flatten_with_paths(grads)}

        for k in LOSS_KEYS:
            self.hist_train[k].append(accum[k] / n_batches)
        with open(os.path.join(self.path_logs, "train_metrics.csv"), "a") as f:
            f.write("\nTraining Epoch {} : \t Train : {:.5e} \t Res : {:.5e}"
                    " \t Jac : {:.5e} \t Enc : {:.5e} \t AE : {:.5e}"
                    " \t MSE : {:.5e}".format(
                        epoch, *(self.hist_train[k][-1] for k in LOSS_KEYS)))

    def validation_loop(self, epoch: int):
        from ..data.reader import prefetch
        n_batches = len(self.loader_val)
        vecs, srads = [], []
        for graph in prefetch(iter(self.loader_val)):
            rng = self._next_rng()
            loss, aux = self._val_step(self.params, graph, rng)
            vecs.append(jnp.stack([loss] + [aux.get(k, jnp.zeros(()))
                                            for k in LOSS_KEYS[1:]]))
            if "sradius" in aux and self.c.val_sradius:
                srads.append(aux["sradius"])
        sums = np.asarray(jnp.stack(vecs)).sum(axis=0)
        accum = {k: float(v) for k, v in zip(LOSS_KEYS, sums)}
        if srads:
            with open(os.path.join(self.path_logs,
                                   "spectral_radius.csv"), "a") as f:
                for s in np.asarray(jnp.stack(srads)):
                    f.write("\n{}".format(float(s)))
        for k in LOSS_KEYS:
            self.hist_val[k].append(accum[k] / n_batches)
        with open(os.path.join(self.path_logs, "train_metrics.csv"), "a") as f:
            f.write("\nValidation Epoch {} : \t Train : {:.5e} \t Res : {:.5e}"
                    " \t Jac : {:.5e} \t Enc : {:.5e} \t AE : {:.5e}"
                    " \t MSE : {:.5e}".format(
                        epoch, *(self.hist_val[k][-1] for k in LOSS_KEYS)))

    # ------------------------------------------------------------- main train

    def train_model(self):
        c = self.c
        checkpoint = None
        # resume continues the epoch numbering where the checkpoint left
        # off and still stops at the ABSOLUTE max_epochs budget
        start_epoch = len(self.hist_val["loss"])
        for epoch in range(start_epoch, c.max_epochs):
            t0 = time.time()
            self.train_loop(epoch)
            self.validation_loop(epoch)

            if self.family == "psignn":
                self.sched_deq.step(self.hist_val["loss"][-1])
                self.sched_ae.step(self.hist_val["loss"][-1])

            self.training_time += time.time() - t0

            # compare EFFECTIVE lrs: the spike guard's lr_scale applies to
            # the psignn schedulers too (advisor r5 finding — without it a
            # guard-halved run can sit below the floor forever)
            if (self.family == "psignn"
                    and self.sched_deq.lr * self.lr_scale <= c.lr_floor
                    and self.sched_ae.lr * self.lr_scale <= c.lr_floor):
                with open(os.path.join(self.path_logs,
                                       "train_metrics.csv"), "a") as f:
                    f.write("\nTraining exit because both learning rates too low !")
                break

            improved = self.hist_val["residual_loss"][-1] <= self.min_loss_save
            if improved:
                self.min_loss_save = self.hist_val["residual_loss"][-1]
            checkpoint = self._make_checkpoint(epoch)
            save_checkpoint(checkpoint, self.path_ckpt, "running_model")
            if improved:
                save_checkpoint(checkpoint, self.path_ckpt, "best_model")
                saved = "\nMODEL SAVED"
            else:
                saved = ""
            with open(os.path.join(self.path_logs, "train_metrics.csv"), "a") as f:
                f.write("\nTraining Epoch {} finished, took current epoch "
                        "{:.2f}s, cumulative time {:.2f}s".format(
                            epoch, time.time() - t0, self.training_time))
                if self.family == "psignn":
                    f.write("\nCurrent Learning rate DEQ : {}".format(
                        self.sched_deq.lr))
                    f.write("\nCurrent Learning rate AUTOENC : {}".format(
                        self.sched_ae.lr))
                f.write(saved)

            if c.spike_guard and not improved and self.min_loss_save < 1e9:
                spiked = (self.hist_val["residual_loss"][-1]
                          > c.spike_factor * self.min_loss_save)
                self._spike_count = self._spike_count + 1 if spiked else 0
                if self._spike_count >= c.spike_patience:
                    best = os.path.join(self.path_ckpt, "best_model.ckpt")
                    if os.path.exists(best):
                        ck = load_checkpoint(best)
                        self.params = ck["params"]
                        self.opt_state = ck["opt_state"]
                    self.lr_scale *= 0.5
                    self._spike_count = 0
                    with open(os.path.join(self.path_logs,
                                           "train_metrics.csv"), "a") as f:
                        f.write("\nSPIKE GUARD: val residual > {:.1f}x best "
                                "for {} epochs - reloaded best checkpoint, "
                                "lr scale now {:g}".format(
                                    c.spike_factor, c.spike_patience,
                                    self.lr_scale))
                    # Re-save running_model so a watchdog restart in the
                    # window before the next epoch completes resumes from
                    # the recovered params + halved lr, not the spiked
                    # state (round-4 advisor finding).
                    save_checkpoint(self._make_checkpoint(epoch),
                                    self.path_ckpt, "running_model")

            if epoch % c.plot_every == 0:
                try:
                    from .plots import plot_losses, plot_gradients
                    plot_losses(self.hist_train, self.hist_val, self.path_logs)
                    plot_gradients(self._last_grad_norms, epoch, self.path_logs)
                except Exception:
                    pass

        if checkpoint is None:
            checkpoint = self._make_checkpoint(c.max_epochs - 1)
        save_checkpoint(checkpoint, self.path_ckpt, "final_model")
        return self.params

    def _make_checkpoint(self, epoch: int) -> Dict[str, Any]:
        ckpt = dict(
            epoch=epoch,
            family=self.family,
            hyperparameters=dataclasses.asdict(self.mc),
            params=self.params,
            opt_state=self.opt_state,
            hist_train=self.hist_train,
            hist_val=self.hist_val,
            min_loss_save=self.min_loss_save,
            lr_scale=self.lr_scale,
            training_time=self.training_time,
        )
        if self.family == "psignn":
            ckpt["sched_deq"] = self.sched_deq.state_dict()
            ckpt["sched_ae"] = self.sched_ae.state_dict()
        return ckpt

    def load_model(self, path: str) -> None:
        """Resume from a checkpoint (training_class.py:68-81) — and unlike
        the reference, actually reachable from the CLI via --resume."""
        ckpt = load_checkpoint(path)
        self.params = jax.tree.map(jnp.asarray, ckpt["params"])
        self.opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        self.hist_train = ckpt["hist_train"]
        self.hist_val = ckpt["hist_val"]
        self.min_loss_save = ckpt["min_loss_save"]
        self.lr_scale = ckpt.get("lr_scale", 1.0)
        self.training_time = ckpt["training_time"]
        if self.family == "psignn":
            self.sched_deq.load_state_dict(ckpt["sched_deq"])
            self.sched_ae.load_state_dict(ckpt["sched_ae"])


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(p.key)
            elif hasattr(p, "idx"):
                keys.append(p.idx)
        out.append((tuple(keys), leaf))
    return out
