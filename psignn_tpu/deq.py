"""Deep-equilibrium core: implicit fixed point with custom backward solve.

Re-designs the reference DEQ wrapper (``dirichlet/psignn/model.py:177-253``)
for JAX.  The reference computes the forward fixed point under ``no_grad``,
re-engages autograd with one tracked evaluation ``new_H* = f(H*)`` where
``H*`` is a detached leaf, and registers a backward hook that replaces the
incoming gradient with the solution of the adjoint linear system
``y = Jᵀ y + grad`` solved by the *same* fixed-point solver
(model.py:210-225).  Here that becomes:

* ``fixed_point_forward`` — the solver run under ``stop_gradient`` semantics
  (it sits outside any vjp; its result is treated as data).
* ``deq_attach`` — a ``jax.custom_vjp`` around ONE application of f whose
  backward runs the adjoint fixed-point solve and routes the resulting
  cotangent into params and h_init (the Dirichlet-reset path), with zero
  cotangent to h_star (the detached leaf) — exactly the reference's autograd
  graph.
* ``jac_loss_estimate`` / ``power_method`` — Hutchinson tr(JᵀJ)/N and
  spectral-radius estimation via ``jax.vjp`` (model.py:416-452).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .solvers import SolverResult, get_solver


def _zero_cotangent(tree):
    """Cotangent pytree of zeros; non-float leaves get float0 (ints/bools)."""
    def z(x):
        if jnp.issubdtype(jnp.result_type(x), jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)
    return jax.tree.map(z, tree)


class DEQConfig(NamedTuple):
    """Solver knobs (model.py:39-45 config_deq).

    ``lowrank_bf16`` stores Broyden's rank-1 factor buffers in bfloat16
    (f32 accumulation) — a TPU-only bandwidth optimization, off by default
    for bit-parity with the reference."""
    solver: str = "broyden"
    fw_tol: float = 1e-5
    fw_thres: int = 300
    bw_tol: float = 1e-8
    bw_thres: int = 300
    lowrank_bf16: bool = False
    lowrank_max_rank: int = 0  # >0: L-BFGS-style Broyden rank cap
    ls: bool = False           # Broyden Armijo line search (solver.py:156)


def _solver_kwargs(cfg: "DEQConfig") -> dict:
    kw = {}
    if cfg.solver == "broyden" and cfg.lowrank_bf16:
        kw["lowrank_dtype"] = jnp.bfloat16
    if cfg.solver == "broyden" and cfg.lowrank_max_rank > 0:
        kw["max_rank"] = cfg.lowrank_max_rank
    if cfg.solver == "broyden" and cfg.ls:
        kw["ls"] = True
    return kw


def fixed_point_forward(f: Callable, params, h_init, graph, cfg: DEQConfig,
                        keep_trace: bool = False) -> SolverResult:
    """Run the forward fixed-point solve h* = f(params, h, h_init, graph).

    Gradients do not flow through the iterates (the caller treats the result
    via ``deq_attach``); we also stop_gradient the inputs defensively so an
    accidental grad through this path is zero rather than an unrolled solve.
    """
    p = jax.lax.stop_gradient(params)
    h0 = jax.lax.stop_gradient(h_init)
    solver = get_solver(cfg.solver)
    return solver(lambda h: f(p, h, h0, graph), h0,
                  threshold=cfg.fw_thres, eps=cfg.fw_tol,
                  keep_trace=keep_trace, **_solver_kwargs(cfg))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def deq_attach(f: Callable, cfg: DEQConfig, params, h_star, h_init, graph,
               bw_sink):
    """One tracked evaluation new_h* = f(h*) with implicit-function backward.

    Forward value matches the reference's returned ``new_H_star``
    (model.py:204-205).  Backward: cotangent g on new_h* is replaced by the
    solution y of y = vjp_f(y) + g (model.py:214-218), then routed through
    the single f application into (params, h_init); h_star and the graph get
    zero cotangent.

    ``bw_sink`` is a (2,) float32 array the primal ignores; its COTANGENT is
    set to [lowest, nstep] of the backward adjoint solve.  Differentiating
    the loss w.r.t. the sink therefore surfaces the backward-solve stats as
    an ordinary device array in the train step's outputs — the reference
    writes backward_iteration.csv from inside its autograd hook
    (model.py:219-221), and the axon PJRT tunnel supports no host callbacks
    (UNIMPLEMENTED: host send/recv), so this is the platform-independent
    route for the same log.
    """
    del bw_sink
    return f(params, h_star, h_init, graph)


def _deq_attach_fwd(f, cfg, params, h_star, h_init, graph, bw_sink):
    new_h = f(params, h_star, h_init, graph)
    return new_h, (params, h_star, h_init, graph, bw_sink)


def _deq_attach_bwd(f, cfg, res, g):
    params, h_star, h_init, graph, bw_sink = res
    _, vjp_fn = jax.vjp(
        lambda p, h, h0: f(p, h, h0, graph), params, h_star, h_init)

    def adjoint(y):
        return vjp_fn(y)[1] + g

    solver = get_solver(cfg.solver)
    out_bw = solver(adjoint, jnp.zeros_like(g),
                    threshold=cfg.bw_thres, eps=cfg.bw_tol,
                    **_solver_kwargs(cfg))
    y_star = out_bw.result
    d_sink = jnp.stack([out_bw.lowest, out_bw.nstep.astype(jnp.float32)]
                       ).astype(bw_sink.dtype)
    d_params, _, d_h_init = vjp_fn(y_star)
    return (d_params, _zero_cotangent(h_star), d_h_init,
            _zero_cotangent(graph), d_sink)


deq_attach.defvjp(_deq_attach_fwd, _deq_attach_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def deq_attach_dist(f: Callable, cfg: DEQConfig, reduce, sync,
                    params, h_star, h_init, graph):
    """``deq_attach`` for a solve living INSIDE ``shard_map``: the backward
    adjoint fixed-point solve runs with the caller's cross-device ``reduce``
    (psum of scalar partials over the partition axis) and ``sync`` (global
    any-reduce loop condition over all mesh axes) hooks, so the adjoint
    system ``y = Jᵀ y + g`` — whose J contains halo-exchange ppermutes — is
    solved with globally-consistent stopping norms, mirroring the forward
    partitioned solve (reference backward hook semantics:
    ``dirichlet/psignn/model.py:210-225``; SURVEY.md §5.7/5.8)."""
    return f(params, h_star, h_init, graph)


def _deq_attach_dist_fwd(f, cfg, reduce, sync, params, h_star, h_init, graph):
    new_h = f(params, h_star, h_init, graph)
    return new_h, (params, h_star, h_init, graph)


def _deq_attach_dist_bwd(f, cfg, reduce, sync, res, g):
    params, h_star, h_init, graph = res
    _, vjp_fn = jax.vjp(
        lambda p, h, h0: f(p, h, h0, graph), params, h_star, h_init)

    def adjoint(y):
        return vjp_fn(y)[1] + g

    solver = get_solver(cfg.solver)
    out_bw = solver(adjoint, jnp.zeros_like(g),
                    threshold=cfg.bw_thres, eps=cfg.bw_tol,
                    reduce=reduce, sync=sync, **_solver_kwargs(cfg))
    y_star = out_bw.result
    d_params, _, d_h_init = vjp_fn(y_star)
    return (d_params, _zero_cotangent(h_star), d_h_init,
            _zero_cotangent(graph))


deq_attach_dist.defvjp(_deq_attach_dist_fwd, _deq_attach_dist_bwd)


def jac_loss_probe(f, params, h_star, h_init, graph, v, denom,
                   reduce=None):
    """Hutchinson jac loss with an EXPLICIT probe vector ``v`` and an
    explicit (already globally-reduced) denominator — the shard-local form
    of ``jac_loss_estimate``: each shard contributes its local ‖vᵀJ‖²
    partial, summed across the partition axis by ``reduce``.  With the same
    concatenated probe, equals the single-device estimate exactly
    (segment-sum associativity; reference model.py:416-435)."""
    h_star = jax.lax.stop_gradient(h_star)
    h0_d = jax.lax.stop_gradient(h_init)
    red = reduce or (lambda s: s)
    _, vjp_fn = jax.vjp(lambda h: f(params, h, h0_d, graph), h_star)
    (vJ,) = vjp_fn(v)
    return red(jnp.sum(jnp.square(vJ))) / denom


class DEQOutput(NamedTuple):
    new_h_star: jax.Array
    jac_loss: jax.Array
    fw_lowest: jax.Array     # forward solve best residual (logged per step)
    fw_nstep: jax.Array      # forward solve iteration count
    sradius: jax.Array       # spectral radius (eval mode only, else 0)


def deq_solve(f: Callable, params, h_init, graph, cfg: DEQConfig,
              rng: jax.Array, compute_sradius: bool = False,
              jac_vecs: int = 1, bw_sink=None) -> DEQOutput:
    """Full DEQ forward: solve, re-attach, jacobian regularizer.

    Mirrors ``DeepEquilibrium.forward`` (model.py:185-243): train mode logs
    (lowest, nstep); eval mode additionally estimates the spectral radius via
    150 power iterations (model.py:238).  ``bw_sink``: see ``deq_attach`` —
    pass a (2,) zeros array and take the loss gradient w.r.t. it to recover
    the backward solve's (lowest, nstep).
    """
    out_fw = fixed_point_forward(f, params, h_init, graph, cfg)
    h_star = out_fw.result
    if bw_sink is None:
        bw_sink = jnp.zeros(2, jnp.float32)
    new_h_star = deq_attach(f, cfg, params, h_star, h_init, graph, bw_sink)
    jac = jac_loss_estimate(f, params, h_star, h_init, graph, rng,
                            vecs=jac_vecs,
                            denom=_true_size(graph, h_star))
    if compute_sradius:
        sradius = power_method(f, params, h_star, h_init, graph, rng,
                               n_iters=150)
    else:
        sradius = jnp.zeros(())
    return DEQOutput(new_h_star=new_h_star, jac_loss=jac,
                     fw_lowest=out_fw.lowest, fw_nstep=out_fw.nstep,
                     sradius=sradius)


def _true_size(graph, h):
    """Unpadded element count N_true·D — the reference normalizes the
    Hutchinson estimate by np.prod(z0.shape) (model.py:435)."""
    if hasattr(graph, "total_nodes"):
        return graph.total_nodes * h.shape[-1]
    return h.size


def jac_loss_estimate(f, params, h_star, h_init, graph, rng, vecs: int = 1,
                      denom=None):
    """Hutchinson estimate of tr(JᵀJ)/size via vᵀJ probes (model.py:416-435).

    Differentiable in params (the reference uses create_graph=True); JAX's
    grad-of-vjp supplies the second-order terms automatically.
    """
    h_star = jax.lax.stop_gradient(h_star)
    h0_d = jax.lax.stop_gradient(h_init)
    if denom is None:
        denom = h_star.size
    total = 0.0
    keys = jax.random.split(rng, vecs)
    for k in keys:
        v = jax.random.normal(k, h_star.shape, h_star.dtype)
        # vᵀJ where J = ∂f/∂h at h_star: a vjp w.r.t. h only.
        _, vjp_fn = jax.vjp(lambda h: f(params, h, h0_d, graph), h_star)
        (vJ,) = vjp_fn(v)
        total = total + jnp.sum(jnp.square(vJ))
    return total / vecs / denom


def power_method(f, params, h_star, h_init, graph, rng, n_iters: int = 150):
    """Spectral radius of J via power iteration on vᵀJ (model.py:437-452)."""
    h_star = jax.lax.stop_gradient(h_star)
    h0 = jax.lax.stop_gradient(h_init)
    p = jax.lax.stop_gradient(params)
    _, vjp_fn = jax.vjp(lambda h: f(p, h, h0, graph), h_star)
    v0 = jax.random.normal(rng, h_star.shape, h_star.dtype)

    def body(_, carry):
        v, _ = carry
        (vJ,) = vjp_fn(v)
        evalue = jnp.vdot(vJ, v) / jnp.vdot(v, v)
        v_new = vJ / jnp.linalg.norm(vJ.reshape(-1))
        return (v_new, jnp.abs(evalue))

    _, sr = jax.lax.fori_loop(0, n_iters, body, (v0, jnp.zeros(())))
    return sr
