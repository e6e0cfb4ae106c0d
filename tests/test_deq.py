"""DEQ implicit-gradient tests: unrolled-autodiff oracle, Hutchinson, power method."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psignn_tpu.deq import (DEQConfig, deq_attach, deq_solve,
                            fixed_point_forward, jac_loss_estimate,
                            power_method)


def make_problem(n=6, d=3, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(d, d)).astype(np.float32) * 0.3
    b = rng.normal(size=(d,)).astype(np.float32) * 0.1
    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    h0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def f(p, h, h_init, graph):
        return jnp.tanh(h @ p["W"] + p["b"] + 0.3 * h_init)

    return f, params, h0


@pytest.mark.parametrize("solver", ["broyden", "anderson", "forward_iteration"])
def test_forward_fixed_point(solver):
    f, params, h0 = make_problem()
    cfg = DEQConfig(solver=solver, fw_tol=1e-7, fw_thres=300)
    out = fixed_point_forward(f, params, h0, None, cfg)
    h = out.result
    np.testing.assert_allclose(np.asarray(f(params, h, h0, None)),
                               np.asarray(h), atol=5e-5)


def test_implicit_gradient_matches_unrolled():
    f, params, h0 = make_problem(seed=1)
    cfg = DEQConfig(solver="broyden", fw_tol=1e-9, fw_thres=400,
                    bw_tol=1e-11, bw_thres=400)

    def loss_implicit(p, h_init):
        out = fixed_point_forward(f, p, h_init, None, cfg)
        new_h = deq_attach(f, cfg, p, out.result, h_init, None,
                           jnp.zeros(2))
        return jnp.sum(new_h ** 2) + 2.0 * jnp.sum(new_h * h_init)

    def loss_unrolled(p, h_init):
        h = h_init
        for _ in range(300):  # full autodiff through the iterations
            h = f(p, h, h_init, None)
        return jnp.sum(h ** 2) + 2.0 * jnp.sum(h * h_init)

    gi_p, gi_h0 = jax.grad(loss_implicit, argnums=(0, 1))(params, h0)
    gu_p, gu_h0 = jax.grad(loss_unrolled, argnums=(0, 1))(params, h0)

    np.testing.assert_allclose(np.asarray(gi_p["W"]), np.asarray(gu_p["W"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_p["b"]), np.asarray(gu_p["b"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_h0), np.asarray(gu_h0),
                               rtol=1e-3, atol=1e-5)


def test_h_star_gets_zero_cotangent():
    f, params, h0 = make_problem(seed=2)
    cfg = DEQConfig(fw_tol=1e-7, bw_tol=1e-9)
    out = fixed_point_forward(f, params, h0, None, cfg)

    def loss_wrt_hstar(h_star):
        return jnp.sum(deq_attach(f, cfg, params, h_star, h0, None,
                                  jnp.zeros(2)) ** 2)

    g = jax.grad(loss_wrt_hstar)(out.result)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_jac_loss_linear_matches_frobenius():
    d = 5
    rng = np.random.default_rng(3)
    M = rng.normal(size=(d, d)).astype(np.float32)
    params = {"M": jnp.asarray(M)}

    def f(p, h, h_init, graph):
        return h @ p["M"].T

    n = 7
    h_star = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    # E[|v^T J|^2] over many probes -> tr(J J^T) / size; J is block-diag M
    vals = []
    for s in range(200):
        v = jac_loss_estimate(f, params, h_star, h_star, None,
                              jax.random.PRNGKey(s), vecs=1)
        vals.append(float(v))
    est = np.mean(vals)
    want = n * np.sum(M ** 2) / (n * d)
    np.testing.assert_allclose(est, want, rtol=0.15)


def test_power_method_spectral_radius():
    d = 6
    rng = np.random.default_rng(4)
    M = rng.normal(size=(d, d)).astype(np.float32)
    M = (M + M.T) / 2  # symmetric: real spectrum so power iteration converges
    params = {"M": jnp.asarray(M)}

    def f(p, h, h_init, graph):
        return h @ p["M"].T

    h_star = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))
    sr = power_method(f, params, h_star, h_star, None,
                      jax.random.PRNGKey(0), n_iters=300)
    want = max(abs(np.linalg.eigvals(M)))
    np.testing.assert_allclose(float(sr), want, rtol=1e-2)


def test_deq_solve_end_to_end_jit():
    f, params, h0 = make_problem(seed=5)
    cfg = DEQConfig(fw_tol=1e-6, fw_thres=200, bw_tol=1e-8, bw_thres=200)

    @jax.jit
    def run(p, h_init, key):
        out = deq_solve(f, p, h_init, None, cfg, key)
        return out

    out = run(params, h0, jax.random.PRNGKey(0))
    assert out.new_h_star.shape == h0.shape
    assert float(out.fw_lowest) < 1e-5
    assert int(out.fw_nstep) > 0
    assert float(out.jac_loss) > 0.0

    @jax.jit
    def train_loss(p, h_init, key):
        out = deq_solve(f, p, h_init, None, cfg, key)
        return jnp.sum(out.new_h_star ** 2) + out.jac_loss

    g = jax.grad(train_loss)(params, h0, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(g["W"])).all()
    assert float(jnp.abs(g["W"]).sum()) > 0
