"""Nonlinear CG solver: convergence vs SciPy CG on standard problems."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize as sp_minimize

from varanneal_tpu.opt.ncg import ncg_minimize, NCGOptions


def test_ncg_quadratic():
    rng = np.random.default_rng(0)
    n = 25
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.normal(size=n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    res = ncg_minimize(vag, jnp.zeros(n),
                       opts=NCGOptions(maxiter=500, pgtol=1e-9,
                                       ftol=1e-16))
    xstar = np.linalg.solve(Q, b)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6,
                               atol=1e-7)


def test_ncg_rosenbrock_vs_scipy():
    n = 10

    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    vag = jax.value_and_grad(f)
    x0 = np.full(n, -1.2)
    res = ncg_minimize(vag, jnp.asarray(x0),
                       opts=NCGOptions(maxiter=5000, pgtol=1e-8,
                                       ftol=1e-17))
    sp = sp_minimize(lambda z: np.asarray(vag(jnp.asarray(z))[0]),
                     x0, jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="CG", options=dict(maxiter=5000, gtol=1e-8))
    # both reach the global minimum at 1
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)
    assert float(res.f) <= max(sp.fun, 1e-12) * 10 + 1e-14


def test_ncg_pytree():
    def f(t):
        return jnp.sum((t["a"] - 2.0) ** 2) + jnp.sum((t["b"] + 1.0) ** 4)

    vag = jax.value_and_grad(f)
    res = ncg_minimize(vag, {"a": jnp.zeros((3, 2)), "b": jnp.zeros(4)},
                       opts=NCGOptions(maxiter=300, pgtol=1e-8))
    np.testing.assert_allclose(np.asarray(res.x["a"]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.x["b"]), -1.0, atol=1e-2)
