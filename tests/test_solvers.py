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
