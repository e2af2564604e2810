"""Compact-representation direction must equal the two-loop recursion
(same BFGS inverse-Hessian, different algebra), for full and partial
history, flat and pytree decision variables."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu.opt import lbfgs_minimize, LBFGSOptions
from varanneal_tpu.opt.lbfgs import _two_loop, _compact_dir


def _random_history(rng, m, hlen, head, shape):
    """Build a raw JOINT circular buffer (rows [0, m) = s_i, rows [m, 2m)
    = y_i) with hlen valid (s, y) pairs with s.y>0, written at slots
    (head-hlen..head-1) mod m."""
    H = np.zeros((2 * m,) + shape)
    rho = np.zeros(m)
    for j in range(hlen):
        slot = (head - hlen + j) % m
        s = rng.normal(size=shape)
        y = rng.normal(size=shape) * 0.3 + s      # ensure s.y > 0
        assert np.sum(s * y) > 0
        H[slot], H[m + slot] = s, y
        rho[slot] = 1.0 / np.sum(s * y)
    return jnp.asarray(H), jnp.asarray(rho)


@pytest.mark.parametrize("hlen", [0, 1, 4, 10])
@pytest.mark.parametrize("head", [0, 3])
def test_compact_equals_two_loop_flat(hlen, head):
    rng = np.random.default_rng(hlen * 10 + head)
    m, n = 10, 37
    H, rho = _random_history(rng, m, hlen, head, (n,))
    g = jnp.asarray(rng.normal(size=n))
    args = (g, H, rho, jnp.asarray(head), jnp.asarray(hlen), m,
            jnp.float64)
    d1 = np.asarray(_two_loop(*args))
    d2 = np.asarray(_compact_dir(*args))
    np.testing.assert_allclose(d2, d1, rtol=1e-10, atol=1e-12)


def test_compact_equals_two_loop_pytree():
    rng = np.random.default_rng(5)
    m, hlen, head = 10, 6, 2
    ha, _ = _random_history(rng, m, hlen, head, (4, 3))
    # build a consistent 2-leaf pytree history: concatenate a second leaf
    hb = np.zeros((2 * m, 5))
    rho = np.zeros(m)
    Ha = np.asarray(ha).copy()
    for j in range(hlen):
        slot = (head - hlen + j) % m
        s2 = rng.normal(size=5)
        y2 = rng.normal(size=5) * 0.3 + s2
        hb[slot], hb[m + slot] = s2, y2
        sy = np.sum(Ha[slot] * Ha[m + slot]) + np.sum(s2 * y2)
        assert sy > 0
        rho[slot] = 1.0 / sy
    H = {"a": jnp.asarray(Ha), "b": jnp.asarray(hb)}
    g = {"a": jnp.asarray(rng.normal(size=(4, 3))),
         "b": jnp.asarray(rng.normal(size=5))}
    args = (g, H, jnp.asarray(rho), jnp.asarray(head),
            jnp.asarray(hlen), m, jnp.float64)
    d1 = _two_loop(*args)
    d2 = _compact_dir(*args)
    for k in ("a", "b"):
        np.testing.assert_allclose(np.asarray(d2[k]), np.asarray(d1[k]),
                                   rtol=1e-10, atol=1e-12)


def test_solver_end_to_end_compact_vs_two_loop():
    rng = np.random.default_rng(0)
    n = 30
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.normal(size=n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    xstar = np.linalg.solve(Q, b)
    for direction in ("compact", "two_loop"):
        res = lbfgs_minimize(
            vag, jnp.zeros(n),
            opts=LBFGSOptions(maxiter=500, pgtol=1e-10, ftol=1e-16,
                              direction=direction))
        np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-7,
                                   atol=1e-8)
