"""Fixed-point solver suite: picard, anderson, broyden, newton.

Re-designs the reference solver module
(``dirichlet/psignn/utilities/solver.py``, 366 LoC) as pure JAX functions
with one shared signature::

    solver(f, x0, threshold, eps, stop_mode='rel', keep_trace=False)
      -> SolverResult

compilable under ``jit``: every solver is a ``lax.while_loop`` with
fixed-shape carries (Broyden's growing low-rank memory becomes fixed
``(threshold, N·D)`` buffers whose unwritten rows are zero, so no dynamic
slicing is needed — zero rows are exact no-ops in the rank-update matvecs).

Semantics preserved from the reference:
* ``broyden`` (solver.py:116-207): rank-1 inverse-Jacobian updates, rel/abs
  stop modes, best-iterate tracking, plateau break (max/min of the last-30
  trace < 1.3 once under 3·eps, solver.py:179-180), divergence protection
  (objective > first·1e3·D, solver.py:181-183), NaN scrubbing of update
  vectors (solver.py:188-189).
* ``anderson`` (solver.py:215-293): window m=2, Tikhonov-regularized
  least squares per step, mixing beta, best-iterate tracking.
* ``picard`` / forward iteration (solver.py:301-341): plain z ← f(z) until
  the *relative* step norm < eps; returns the last iterate.
* ``newton`` (solver.py:349-366): dense-Jacobian Newton wrapped as picard
  on z ← z − J⁻¹ g(z); demo-scale only.

All norms are over the full flattened state; padded rows must be kept at
exactly zero by the caller (see ``graphs.PaddedGraph`` docs) so they do not
perturb the norms.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class SolverResult(NamedTuple):
    result: jax.Array        # (N, D) best (broyden/anderson) or last (picard)
    lowest: jax.Array        # scalar: best stop-mode residual
    nstep: jax.Array         # int32: step index of the best iterate
    prot_break: jax.Array    # bool
    abs_trace: jax.Array     # (threshold,) residual trace (abs mode)
    rel_trace: jax.Array     # (threshold,) residual trace (rel mode)
    trace: Optional[jax.Array]      # (threshold+1, N, D) iterates, or None
    trace_len: jax.Array     # int32: number of valid iterates in `trace`


def _vdot(a, b):
    return jnp.vdot(a, b, precision=_HI)


def _norm(a):
    return jnp.sqrt(_vdot(a, a))


def _safe_norm(v):
    """inf if any entry is non-finite (solver.py:14-18)."""
    n = _norm(v)
    return jnp.where(jnp.all(jnp.isfinite(v)), n, jnp.inf)


# ---------------------------------------------------------------------------
# Picard / forward iteration
# ---------------------------------------------------------------------------

def _sync_loop(sync: Optional[Callable]):
    """Tools for running a solver loop on a device mesh where OTHER mesh
    rows may still be iterating (e.g. dp × partition: each dp row is an
    independent solve, but collectives inside f rendezvous across the whole
    mesh, so every device must take the same number of loop trips or the
    program deadlocks).  ``sync(continue_bool) -> bool`` is a global
    any-reduce over ALL mesh axes; rows that have already stopped keep
    executing the body's collectives but FREEZE their carry."""
    if sync is None:
        return (lambda cont: cont), (lambda stopped, old, new: new)

    def freeze(stopped, old, new):
        return jax.tree.map(lambda o, n: jnp.where(stopped, o, n), old, new)

    return sync, freeze


def picard(f: Callable, x0: jax.Array, threshold: int = 50, eps: float = 1e-5,
           stop_mode: str = "rel", keep_trace: bool = False,
           reduce: Optional[Callable] = None,
           sync: Optional[Callable] = None) -> SolverResult:
    """Plain fixed-point iteration (solver.py:301-341). Always stops on the
    relative step norm as the reference does; ``stop_mode`` ignored.

    ``reduce`` sums scalar partial reductions across a device mesh (pass
    ``lambda s: lax.psum(s, axis)`` when x0 is a shard of the global state
    inside shard_map) — stopping tests then see the GLOBAL residual norm,
    SURVEY.md §5.7's partitioned-solve requirement.  ``sync``: global
    any-reduce for the loop condition when independent solves share one
    mesh (see ``_sync_loop``)."""
    del stop_mode
    red = reduce or (lambda s: s)
    sync_any, freeze = _sync_loop(sync)

    def norm(a):
        return jnp.sqrt(red(_vdot(a, a)))

    shape = x0.shape
    z0 = x0.reshape(-1)

    z1 = f(x0).reshape(-1)
    abs0 = norm(z0 - z1)
    rel0 = abs0 / norm(z1)

    T = threshold
    abs_trace = jnp.zeros((T + 1,)).at[0].set(abs0)
    rel_trace = jnp.zeros((T + 1,)).at[0].set(rel0)
    trace = None
    if keep_trace:
        trace = jnp.zeros((T + 2,) + shape, x0.dtype)
        trace = trace.at[0].set(x0).at[1].set(z1.reshape(shape))

    def cond(c):
        return sync_any((c["rel"] > eps) & (c["ite"] < T))

    def body(c):
        z_prev = c["z"]
        z = f(z_prev.reshape(shape)).reshape(-1)
        ite = c["ite"] + 1
        ab = norm(z_prev - z)
        rel = ab / norm(z)
        c2 = dict(c, z=z, ite=ite, rel=rel,
                  abs_trace=c["abs_trace"].at[ite].set(ab),
                  rel_trace=c["rel_trace"].at[ite].set(rel))
        if keep_trace:
            c2["trace"] = c["trace"].at[ite + 1].set(z.reshape(shape))
        return freeze((c["rel"] <= eps) | (c["ite"] >= T), c, c2)

    carry = dict(z=z1, ite=jnp.int32(0), rel=rel0,
                 abs_trace=abs_trace, rel_trace=rel_trace)
    if keep_trace:
        carry["trace"] = trace
    out = jax.lax.while_loop(cond, body, carry)

    return SolverResult(
        result=out["z"].reshape(shape),
        lowest=out["rel"],
        nstep=out["ite"],
        prot_break=jnp.bool_(False),
        abs_trace=out["abs_trace"][:T],
        rel_trace=out["rel_trace"][:T],
        trace=out.get("trace"),
        trace_len=out["ite"] + 2,
    )


forward_iteration = picard


# ---------------------------------------------------------------------------
# Anderson acceleration
# ---------------------------------------------------------------------------

def anderson(f: Callable, x0: jax.Array, threshold: int = 50, eps: float = 1e-3,
             stop_mode: str = "rel", m: int = 2, lam: float = 1e-4,
             beta: float = 1.0, keep_trace: bool = False,
             reduce: Optional[Callable] = None,
             sync: Optional[Callable] = None) -> SolverResult:
    """Anderson acceleration with window m (solver.py:215-293).

    ``reduce``: cross-device sum of scalar partials (see ``picard``); the
    normal-equation Gram matrix and the stopping norms become global.
    ``sync``: global any-reduce for the loop condition (see ``_sync_loop``)."""
    red = reduce or (lambda s: s)
    sync_any, freeze = _sync_loop(sync)

    def norm(a):
        return jnp.sqrt(red(_vdot(a, a)))

    shape = x0.shape
    d = x0.size
    T = threshold
    big = 1e8

    x0f = x0.reshape(-1)
    X = jnp.zeros((m, d), x0.dtype)
    F = jnp.zeros((m, d), x0.dtype)
    X = X.at[0].set(x0f)
    F = F.at[0].set(f(x0).reshape(-1))
    X = X.at[1 % m].set(F[0])
    F = F.at[1 % m].set(f(F[0].reshape(shape)).reshape(-1))

    trace = None
    if keep_trace:
        trace = jnp.zeros((T + 1,) + shape, x0.dtype).at[0].set(x0)

    def cond(c):
        return sync_any((c["k"] < T) & jnp.logical_not(c["done"]))

    def body(c):
        k = c["k"]
        n_valid = jnp.minimum(k, m)
        slot = jnp.arange(m)
        valid = slot < n_valid
        G = (c["F"] - c["X"]) * valid[:, None].astype(x0.dtype)
        GGT = red(jnp.matmul(G, G.T, precision=_HI))
        H = jnp.zeros((m + 1, m + 1), x0.dtype)
        H = H.at[1:, 1:].set(GGT + lam * jnp.eye(m, dtype=x0.dtype))
        H = H.at[0, 1:].set(valid.astype(x0.dtype))
        H = H.at[1:, 0].set(valid.astype(x0.dtype))
        # invalid slots → identity rows/cols so alpha_j = 0 there
        inv = jnp.logical_not(valid)
        H = H.at[1:, 1:].set(
            jnp.where((inv[:, None] | inv[None, :]),
                      jnp.eye(m, dtype=x0.dtype), H[1:, 1:]))
        y = jnp.zeros((m + 1,), x0.dtype).at[0].set(1.0)
        alpha = jnp.linalg.solve(H, y)[1:]
        xk = beta * alpha @ c["F"] + (1 - beta) * alpha @ c["X"]
        fk = f(xk.reshape(shape)).reshape(-1)
        slot_k = jnp.mod(k, m)
        X = c["X"].at[slot_k].set(xk)
        F = c["F"].at[slot_k].set(fk)

        gx = fk - xk
        ab = norm(gx)
        rel = ab / (1e-5 + norm(fk))
        diff = rel if stop_mode == "rel" else ab
        better = diff < c["lowest"]
        lowest = jnp.where(better, diff, c["lowest"])
        lowest_alt = jnp.where(
            (ab if stop_mode == "rel" else rel) < c["lowest_alt"],
            (ab if stop_mode == "rel" else rel), c["lowest_alt"])
        lowest_x = jnp.where(better, xk, c["lowest_x"])
        lowest_step = jnp.where(better, k, c["lowest_step"])
        c2 = dict(c, X=X, F=F, k=k + 1,
                  lowest=lowest, lowest_alt=lowest_alt, lowest_x=lowest_x,
                  lowest_step=lowest_step,
                  abs_trace=c["abs_trace"].at[k - 2].set(ab),
                  rel_trace=c["rel_trace"].at[k - 2].set(rel),
                  done=diff < eps)
        if keep_trace:
            # the reference appends the running best each step (solver.py:273)
            c2["trace"] = c["trace"].at[k - 1].set(lowest_x.reshape(shape))
        return freeze(c["done"] | (c["k"] >= T), c, c2)

    carry = dict(X=X, F=F, k=jnp.int32(2), done=jnp.bool_(False),
                 lowest=jnp.array(big, x0.dtype),
                 lowest_alt=jnp.array(big, x0.dtype),
                 lowest_x=x0f, lowest_step=jnp.int32(0),
                 abs_trace=jnp.zeros((T,)), rel_trace=jnp.zeros((T,)))
    if keep_trace:
        carry["trace"] = trace
    out = jax.lax.while_loop(cond, body, carry)

    return SolverResult(
        result=out["lowest_x"].reshape(shape),
        lowest=out["lowest"],
        nstep=out["lowest_step"],
        prot_break=jnp.bool_(False),
        abs_trace=out["abs_trace"],
        rel_trace=out["rel_trace"],
        trace=out.get("trace"),
        trace_len=out["k"] - 1,
    )


# ---------------------------------------------------------------------------
# Broyden's method
# ---------------------------------------------------------------------------

# Rank-1 factors are stored in step-blocks: per-iteration HBM traffic is
# ceil(nstep/_LR_BLOCK) blocks instead of the full threshold.  128 measured
# best on v5e (steady-state within 4% of 32 at 4x less compile time).
_LR_BLOCK = 128


def _lr_matmul(a, b):
    """Rank-block matmul with f32 accumulation regardless of storage dtype.

    When the low-rank buffers are stored bf16 (``lowrank_dtype``), the MXU
    consumes them natively and accumulates in f32; HBM traffic per live rank
    halves versus f32 storage."""
    return jnp.matmul(a, b, precision=_HI,
                      preferred_element_type=jnp.float32)


def _armijo_line_search(g: Callable, x0: jax.Array, gx0: jax.Array,
                        update: jax.Array, red: Callable,
                        c1: float = 1e-4, amin: float = 1e-2,
                        sync: Optional[Callable] = None):
    """Armijo backtracking on φ(s) = ‖g(x0 + s·update)‖² with derφ0 = −φ0
    (the reference's heuristic, solver.py:61-94 / scalar_search_armijo
    :20-59): try s=1, then a quadratic-interpolant step, then cubic
    interpolation with the reference's halving safeguard until the first
    Wolfe condition holds or the step falls below ``amin`` (→ s=1 fallback).
    Returns (x_new, gx_new); each candidate costs one g evaluation."""
    dt = x0.dtype
    sync_any, freeze = _sync_loop(sync)

    def phi_eval(s):
        x = x0 + s * update
        gx = g(x)
        nonfin = red(jnp.sum((~jnp.isfinite(gx)).astype(jnp.float32)))
        ph = jnp.where(nonfin == 0, red(_vdot(gx, gx)), jnp.inf)
        return ph, x, gx

    phi0 = red(_vdot(gx0, gx0))
    derphi0 = -phi0
    phi_1, x_1, gx_1 = phi_eval(jnp.asarray(1.0, dt))
    ok0 = phi_1 <= phi0 + c1 * derphi0

    # quadratic interpolant minimizer (solver.py:27)
    alpha1 = -derphi0 / 2.0 / (phi_1 - phi0 - derphi0)
    phi_a1, _, _ = phi_eval(alpha1)

    def cond(c):
        return sync_any((~c["done"]) & (c["alpha1"] > amin))

    def body(c):
        a0, a1 = c["alpha0"], c["alpha1"]
        pa0, pa1 = c["phi_a0"], c["phi_a1"]
        factor = a0 ** 2 * a1 ** 2 * (a1 - a0)
        A = (a0 ** 2 * (pa1 - phi0 - derphi0 * a1)
             - a1 ** 2 * (pa0 - phi0 - derphi0 * a0)) / factor
        B2 = (-a0 ** 3 * (pa1 - phi0 - derphi0 * a1)
              + a1 ** 3 * (pa0 - phi0 - derphi0 * a0)) / factor
        a2 = (-B2 + jnp.sqrt(jnp.abs(B2 ** 2 - 3 * A * derphi0))) / (3.0 * A)
        pa2, x2, gx2 = phi_eval(a2)
        acc = pa2 <= phi0 + c1 * a2 * derphi0
        # halving safeguard BEFORE the shift, φ value kept from the
        # pre-safeguard α2 (faithful to solver.py:50-56)
        a2_next = jnp.where(((a1 - a2) > a1 / 2.0) | ((1 - a2 / a1) < 0.96),
                            a1 / 2.0, a2)
        c2 = dict(alpha0=a1, alpha1=a2_next, phi_a0=pa1, phi_a1=pa2,
                  done=acc,
                  x=jnp.where(acc, x2, c["x"]),
                  gx=jnp.where(acc, gx2, c["gx"]))
        return freeze(c["done"] | (c["alpha1"] <= amin), c, c2)

    carry = dict(alpha0=jnp.asarray(1.0, dt), alpha1=alpha1,
                 phi_a0=phi_1, phi_a1=phi_a1, done=ok0,
                 x=x_1, gx=gx_1)
    out = jax.lax.while_loop(cond, body, carry)
    # loop exit without acceptance → s = 1.0 fallback (solver.py:85-87),
    # which is exactly (x_1, gx_1) — already the carry default when the
    # only acceptance was ok0 or none happened
    x_new = jnp.where(out["done"], out["x"], x_1)
    gx_new = jnp.where(out["done"], out["gx"], gx_1)
    return x_new, gx_new


def broyden(f: Callable, x0: jax.Array, threshold: int = 50, eps: float = 1e-3,
            stop_mode: str = "rel", keep_trace: bool = False,
            lowrank_dtype=None, max_rank: int = 0, ls: bool = False,
            reduce: Optional[Callable] = None,
            sync: Optional[Callable] = None) -> SolverResult:
    """Broyden quasi-Newton root finder for g(x) = f(x) − x
    (solver.py:116-207, default no line search as the reference calls it).

    ``lowrank_dtype`` selects the storage dtype of the rank-1 factor buffers
    ``Us/VTs`` (default: x0.dtype).  ``jnp.bfloat16`` halves the dominant
    late-iteration HBM traffic; the rank-op matvecs always accumulate in f32
    (see ``_lr_matmul``), and the Broyden *update* vectors u/vᵀ are computed
    in full precision before being stored.  EXPERIMENTAL: the ~0.4 % factor
    error can destabilize long solves (measured: divergence protection trips
    ≈ step 50 on an 11 k-node mesh — docs/PERF.md "Negative results").

    ``max_rank`` > 0 caps the low-rank memory L-BFGS-style: the newest
    rank-1 pair overwrites the oldest once ``max_rank`` (rounded up to the
    step block) pairs are stored, so the inverse-Jacobian estimate uses only
    the most recent pairs and the per-iteration rank-op HBM traffic is
    bounded by the cap instead of growing with nstep.  0 = full memory
    (the reference's semantics, solver.py:185-192).

    ``ls=True`` enables the reference's Armijo line search on each Broyden
    step (solver.py:156, line_search:61-94).  ``reduce`` sums scalar partial
    contractions across a device mesh (see ``picard``) so the solver can run
    on a SHARD of the global state inside shard_map with exact global
    norms/secant products — the partitioned-solve hook of SURVEY.md §5.7.
    ``sync``: global any-reduce for the loop condition when independent
    solves share one mesh (see ``_sync_loop``)."""
    if stop_mode not in ("rel", "abs"):
        raise ValueError(stop_mode)
    red = reduce or (lambda s: s)
    sync_any, freeze = _sync_loop(sync)

    def norm(a):
        return jnp.sqrt(red(_vdot(a, a)))

    shape = x0.shape
    d = x0.size
    T = threshold
    big = 1e8
    # seq_len in the reference's (1, N, D) view is D (solver.py:121,140)
    seq_len = shape[-1] if x0.ndim > 1 else 1
    protect_thres = (1e6 if stop_mode == "abs" else 1e3) * seq_len

    xf = x0.reshape(-1)
    g = lambda xflat: f(xflat.reshape(shape)).reshape(-1) - xflat
    gx = g(xf)
    B = _LR_BLOCK
    R_cap = T if max_rank <= 0 else min(T, -(-max_rank // B) * B)
    n_blocks_cap = -(-R_cap // B)
    lr_dtype = lowrank_dtype or x0.dtype
    Us = jnp.zeros((n_blocks_cap, B, d), lr_dtype)
    VTs = jnp.zeros((n_blocks_cap, B, d), lr_dtype)
    update = gx  # −matvec(empty) = +gx

    trace = None
    if keep_trace:
        trace = jnp.zeros((T + 1,) + shape, x0.dtype).at[0].set(x0)

    def cond(c):
        return sync_any((c["nstep"] < T) & jnp.logical_not(c["stop"]))

    def body(c):
        if ls:
            x_new, gx_new = _armijo_line_search(g, c["x"], c["gx"],
                                                c["update"], red, sync=sync)
        else:
            x_new = c["x"] + c["update"]
            gx_new = g(x_new)
        nstep = c["nstep"] + 1

        ab = norm(gx_new)
        rel = ab / (norm(gx_new + x_new) + 1e-9)
        diff = rel if stop_mode == "rel" else ab
        alt = ab if stop_mode == "rel" else rel

        abs_trace = c["abs_trace"].at[nstep - 1].set(ab)
        rel_trace = c["rel_trace"].at[nstep - 1].set(rel)
        stop_trace = rel_trace if stop_mode == "rel" else abs_trace

        better = diff < c["lowest"]
        lowest = jnp.where(better, diff, c["lowest"])
        lowest_x = jnp.where(better, x_new, c["lowest_x"])
        lowest_gx = jnp.where(better, gx_new, c["lowest_gx"])
        lowest_step = jnp.where(better, nstep, c["lowest_step"])
        lowest_alt = jnp.where(alt < c["lowest_alt"], alt, c["lowest_alt"])
        lowest_alt_step = jnp.where(alt < c["lowest_alt"], nstep,
                                    c["lowest_alt_step"])

        converged = diff < eps
        # plateau break: last-30 window flat once under 3·eps (solver.py:179-180)
        win_start = jnp.maximum(nstep - 30, 0)
        idx = win_start + jnp.arange(30)
        win = stop_trace[jnp.clip(idx, 0, T - 1)]
        wmax = jnp.max(jnp.where(idx < nstep, win, -jnp.inf))
        wmin = jnp.min(jnp.where(idx < nstep, win, jnp.inf))
        plateau = (diff < 3 * eps) & (nstep > 30) & (wmax / wmin < 1.3)
        first = stop_trace[0]
        prot = diff > first * protect_thres

        # Broyden rank-1 update (solver.py:185-192); rows ≥ nstep are zero so
        # the blocked buffers equal the reference's :nstep-1 slices, and only
        # the ceil(nstep/B) live blocks are streamed from HBM.
        #
        # The three rank-op sweeps of a direct port — rmatvec(Δx),
        # matvec(Δg), matvec(g_new), semantics of solver.py:96-114 with
        # x^T(−I+UVᵀ) and (−I+UVᵀ)x — are fused into ONE blocked pass: the
        # two matvec right-hand sides are stacked into a (2, d) operand, and
        # the post-update matvec(g_new) is recovered from the pre-update one
        # via the appended pair, matvec_new(x) = matvec_old(x) + u·(vᵀx).
        # This is the dominant late-iteration HBM cost (each live block is
        # ~57 MB at d≈113k), so sweep count ≈ wall-clock.
        nblk = jnp.minimum((nstep + B - 1) // B, n_blocks_cap)
        delta_x = x_new - c["x"]
        delta_gx = gx_new - c["gx"]
        rhs2 = jnp.stack([delta_gx, gx_new])                  # (2, d)

        def rank_body(i, accs):
            ra, mv2 = accs
            Ui, Vi = c["Us"][i], c["VTs"][i]
            # red(): the u/vᵀ factors are sharded over d in partitioned
            # mode, so the (B,)/(B,2) contraction coefficients are global
            xtu = red(_lr_matmul(Ui, delta_x.astype(Ui.dtype)))   # (B,)
            ra = ra + _lr_matmul(xtu.astype(Vi.dtype), Vi)        # (d,)
            vtx = red(_lr_matmul(Vi, rhs2.T.astype(Vi.dtype)))    # (B, 2)
            mv2 = mv2 + _lr_matmul(vtx.T.astype(Ui.dtype), Ui)    # (2, d)
            return (ra, mv2)

        ra, mv2 = jax.lax.fori_loop(
            0, nblk, rank_body,
            (jnp.zeros_like(xf, jnp.float32),
             jnp.zeros((2,) + xf.shape, jnp.float32)))
        # Rank-cap eviction (max_rank): the new pair overwrites the ring
        # slot of the oldest pair.  For a CONSISTENT limited-memory update,
        # evict FIRST: subtract the old pair's rank-1 terms from all three
        # sweep results (cheap vector ops), so vᵀ, the secant denominator,
        # u, and the next update are all computed under the post-eviction
        # operator.  Below the cap the slot row is all-zero → exact no-ops,
        # and the path is bit-identical to full-memory Broyden.
        slot = (nstep - 1) % R_cap
        if max_rank > 0:  # static: full-memory never wraps, skip the reads
            u_old = c["Us"][slot // B, slot % B].astype(x0.dtype)
            v_old = c["VTs"][slot // B, slot % B].astype(x0.dtype)
            ra = ra - red(_vdot(delta_x, u_old)) * v_old
            mv2 = mv2 - jnp.stack([u_old * red(_vdot(v_old, delta_gx)),
                                   u_old * red(_vdot(v_old, gx_new))])

        vT = (-delta_x + ra).astype(x0.dtype)                 # rmatvec(Δx)
        denom = red(_vdot(vT, delta_gx))
        mv_dgx = (-delta_gx + mv2[0]).astype(x0.dtype)        # matvec(Δg)
        mv_gx = (-gx_new + mv2[1]).astype(x0.dtype)           # matvec(g_new), pre-update
        u = (delta_x - mv_dgx) / denom
        vT = jnp.nan_to_num(vT, nan=0.0, posinf=0.0, neginf=0.0)
        u = jnp.nan_to_num(u, nan=0.0, posinf=0.0, neginf=0.0)
        Us = c["Us"].at[slot // B, slot % B].set(u)
        VTs = c["VTs"].at[slot // B, slot % B].set(vT)
        new_update = -(mv_gx + u * red(_vdot(vT, gx_new)))

        c2 = dict(c, x=x_new, gx=gx_new, update=new_update, Us=Us, VTs=VTs,
                  nstep=nstep, abs_trace=abs_trace, rel_trace=rel_trace,
                  lowest=lowest, lowest_x=lowest_x, lowest_gx=lowest_gx,
                  lowest_step=lowest_step, lowest_alt=lowest_alt,
                  lowest_alt_step=lowest_alt_step,
                  prot_break=c["prot_break"] | prot,
                  stop=converged | plateau | prot)
        if keep_trace:
            c2["trace"] = c["trace"].at[nstep].set(x_new.reshape(shape))
        return freeze(c["stop"] | (c["nstep"] >= T), c, c2)

    carry = dict(x=xf, gx=gx, update=update, Us=Us, VTs=VTs,
                 nstep=jnp.int32(0),
                 abs_trace=jnp.zeros((T,)), rel_trace=jnp.zeros((T,)),
                 lowest=jnp.array(big, x0.dtype), lowest_x=xf, lowest_gx=gx,
                 lowest_step=jnp.int32(0),
                 lowest_alt=jnp.array(big, x0.dtype),
                 lowest_alt_step=jnp.int32(0),
                 prot_break=jnp.bool_(False), stop=jnp.bool_(False))
    if keep_trace:
        carry["trace"] = trace
    out = jax.lax.while_loop(cond, body, carry)

    # pad unvisited trace entries with the lowest value (solver.py:195-197)
    steps = jnp.arange(T)
    visited = steps < out["nstep"]
    if stop_mode == "rel":
        rel_tr = jnp.where(visited, out["rel_trace"], out["lowest"])
        abs_tr = jnp.where(visited, out["abs_trace"], out["lowest_alt"])
    else:
        abs_tr = jnp.where(visited, out["abs_trace"], out["lowest"])
        rel_tr = jnp.where(visited, out["rel_trace"], out["lowest_alt"])

    return SolverResult(
        result=out["lowest_x"].reshape(shape),
        lowest=out["lowest"],
        nstep=out["lowest_step"],
        prot_break=out["prot_break"],
        abs_trace=abs_tr,
        rel_trace=rel_tr,
        trace=out.get("trace"),
        trace_len=out["nstep"] + 1,
    )


# ---------------------------------------------------------------------------
# Newton's method (dense Jacobian; demo-scale, solver.py:349-366)
# ---------------------------------------------------------------------------

def newton(f: Callable, x0: jax.Array, threshold: int = 50, eps: float = 1e-5,
           stop_mode: str = "rel", keep_trace: bool = False) -> SolverResult:
    shape = x0.shape
    d = x0.size

    def g_root(zf):
        return f(zf.reshape(shape)).reshape(-1) - zf

    def newton_step(z):
        zf = z.reshape(-1)
        J = jax.jacrev(g_root)(zf)
        step = jnp.linalg.solve(J, g_root(zf))
        return (zf - step).reshape(shape)

    return picard(newton_step, x0, threshold=threshold, eps=eps,
                  keep_trace=keep_trace)


def newton_krylov(f: Callable, x0: jax.Array, threshold: int = 50,
                  eps: float = 1e-5, stop_mode: str = "rel",
                  inner_iters: int = 20,
                  keep_trace: bool = False) -> SolverResult:
    """Jacobian-free Newton-Krylov: outer Newton steps with GMRES inner
    solves whose matvec is a JVP of g(x) = f(x) − x.

    The scalable replacement for the reference's dense-Jacobian ``newton``
    (solver.py:349-366): no N·D × N·D materialization, only
    ``inner_iters`` JVPs per outer step (BASELINE.json north star names
    Newton-Krylov for the implicit solves)."""
    from jax.scipy.sparse.linalg import gmres

    shape = x0.shape

    def g_root(z):
        return f(z) - z

    def newton_step(z):
        gz = g_root(z)
        _, jvp_fn = jax.linearize(g_root, z)
        dz, _ = gmres(jvp_fn, -gz, x0=jnp.zeros_like(z),
                      restart=inner_iters, maxiter=1, solve_method="batched")
        return z + dz

    return picard(newton_step, x0, threshold=threshold, eps=eps,
                  keep_trace=keep_trace)


SOLVERS = {
    "broyden": broyden,
    "anderson": anderson,
    "forward_iteration": picard,
    "picard": picard,
    "newton": newton,
    "newton_krylov": newton_krylov,
}


def get_solver(name: str) -> Callable:
    """Solver dispatch by flag name (main.py:81-90)."""
    if name not in SOLVERS:
        raise ValueError(f"unknown solver '{name}'; choose from {list(SOLVERS)}")
    return SOLVERS[name]
