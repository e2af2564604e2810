"""Device-side L-BFGS vs SciPy L-BFGS-B: parity at converged minima
(SURVEY.md §7 hard-part #1 contract — same basin, same minimum, not
iterate-for-iterate)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import minimize as sp_minimize

from varanneal_tpu.opt import lbfgs_minimize, LBFGSOptions


def rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def quad_factory(n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.normal(size=n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    return f, Q, b


def test_rosenbrock_unbounded():
    n = 12
    x0 = np.full(n, -1.2)
    vag = jax.value_and_grad(rosen)
    res = lbfgs_minimize(
        vag, jnp.asarray(x0),
        opts=LBFGSOptions(maxiter=2000, pgtol=1e-10, ftol=1e-17))
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)
    assert float(res.f) < 1e-14
    assert int(res.status) in (0, 1)


def test_quadratic_matches_scipy():
    n = 30
    f, Q, b = quad_factory(n)
    x0 = np.zeros(n)
    vag = jax.value_and_grad(f)
    res = lbfgs_minimize(
        vag, jnp.asarray(x0),
        opts=LBFGSOptions(maxiter=500, pgtol=1e-10, ftol=1e-16))
    sp = sp_minimize(lambda z: np.asarray(vag(jnp.asarray(z))[0]),
                     x0, jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="L-BFGS-B",
                     options=dict(maxiter=500, gtol=1e-10, ftol=1e-14))
    xstar = np.linalg.solve(Q, b)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-7, atol=1e-8)
    assert abs(float(res.f) - sp.fun) <= 1e-10 * max(1.0, abs(sp.fun))


@pytest.mark.parametrize("seed", [1, 2])
def test_bounded_quadratic_matches_scipy(seed):
    """Box-constrained quadratic with the unconstrained minimum outside the
    box — active bounds at the solution."""
    n = 20
    f, Q, b = quad_factory(n, seed)
    lo = np.full(n, -0.05)
    hi = np.full(n, 0.05)
    x0 = np.zeros(n)
    vag = jax.value_and_grad(f)
    res = lbfgs_minimize(
        vag, jnp.asarray(x0), lower=lo, upper=hi,
        opts=LBFGSOptions(maxiter=1000, pgtol=1e-12, ftol=1e-17))
    sp = sp_minimize(lambda z: np.asarray(vag(jnp.asarray(z))[0]),
                     x0, jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="L-BFGS-B", bounds=list(zip(lo, hi)),
                     options=dict(maxiter=1000, gtol=1e-12, ftol=1e-15))
    assert float(res.f) <= sp.fun + 1e-9 * max(1.0, abs(sp.fun))
    np.testing.assert_allclose(np.asarray(res.x), sp.x, atol=5e-6)
    # feasibility
    assert np.all(np.asarray(res.x) >= lo - 1e-12)
    assert np.all(np.asarray(res.x) <= hi + 1e-12)


def test_vmap_batch_of_problems():
    """The solver must vmap: converged lanes become no-ops while slow lanes
    continue (ensemble-of-inits contract)."""
    def f(x):
        return jnp.sum((x - jnp.arange(x.shape[0], dtype=x.dtype)) ** 4
                       + 0.5 * x ** 2)

    vag = jax.value_and_grad(f)
    B, n = 8, 6
    rng = np.random.default_rng(0)
    X0 = rng.normal(size=(B, n)) * 3

    o = LBFGSOptions(maxiter=400, pgtol=1e-9, ftol=1e-18)
    solve = jax.vmap(lambda x0: lbfgs_minimize(vag, x0, opts=o))
    res = solve(jnp.asarray(X0))
    # every lane must match its solo run to machine precision: converged
    # lanes are masked no-ops while slow lanes continue (reduction order
    # differs by at most an ulp between batched and solo execution)
    for i in (0, 3, 5):
        ref = lbfgs_minimize(vag, jnp.asarray(X0[i]), opts=o)
        np.testing.assert_allclose(np.asarray(res.x)[i], np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-14)
        assert int(np.asarray(res.niter)[i]) == int(ref.niter)
    # all lanes drive the gradient to f64 round-off for this f's scale
    assert np.all(np.asarray(res.pgnorm) <= 1e-7)


def test_jit_and_grad_eval_count():
    n = 10
    f, Q, b = quad_factory(n, 3)
    vag = jax.value_and_grad(f)
    run = jax.jit(lambda x0: lbfgs_minimize(
        vag, x0, opts=LBFGSOptions(maxiter=200)))
    res = run(jnp.zeros(n))
    assert int(res.nfev) >= int(res.niter)
    assert int(res.status) in (0, 1)
