"""L-BFGS-B subspace solver: compact-matrix identities, GCP vs brute
force, subspace step vs dense solve, and end-to-end parity with SciPy's
Fortran L-BFGS-B (the reference's bounded minimizer)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize as sp_minimize

from varanneal_tpu.opt import LBFGSOptions, lbfgs_minimize
from varanneal_tpu.opt.lbfgsb import (
    lbfgsb_minimize, _compact_matrices, _cauchy_point, _subspace_step)


def _history(rng, m, n):
    S = rng.normal(size=(m, n))
    Yh = rng.normal(size=(m, n))
    for i in range(m):                    # enforce sy > 0 per pair
        if S[i] @ Yh[i] <= 0:
            Yh[i] = -Yh[i]
    return S, Yh


def test_compact_matrices_identities():
    """θ, W, M⁻¹ must reproduce the BNS compact direct Hessian: symmetric,
    PD, satisfying the secant condition on the newest pair."""
    rng = np.random.default_rng(0)
    n, m = 12, 4
    S, Yh = _history(rng, m, n)
    theta, Wt, Minv = _compact_matrices(
        jnp.asarray(S), jnp.asarray(Yh), jnp.asarray(0, jnp.int32),
        jnp.asarray(m, jnp.int32), m, jnp.float64)
    theta, Wt, Minv = map(np.asarray, (theta, Wt, Minv))
    B = theta * np.eye(n) - Wt.T @ np.linalg.inv(Minv) @ Wt
    assert np.allclose(B, B.T)
    assert np.all(np.linalg.eigvalsh(B) > 0)
    np.testing.assert_allclose(B @ S[m - 1], Yh[m - 1], atol=1e-8)
    th_ref = (Yh[m - 1] @ Yh[m - 1]) / (S[m - 1] @ Yh[m - 1])
    assert np.isclose(theta, th_ref)


def test_cauchy_point_matches_brute_force():
    """The vectorized GCP must minimize the quadratic model along the
    projected steepest-descent path (checked against a dense t-grid)."""
    rng = np.random.default_rng(1)
    n, m = 12, 4
    S, Yh = _history(rng, m, n)
    theta, Wt, Minv = _compact_matrices(
        jnp.asarray(S), jnp.asarray(Yh), jnp.asarray(0, jnp.int32),
        jnp.asarray(m, jnp.int32), m, jnp.float64)
    B = (np.asarray(theta) * np.eye(n)
         - np.asarray(Wt).T @ np.linalg.inv(np.asarray(Minv))
         @ np.asarray(Wt))
    x = rng.normal(size=n)
    g = rng.normal(size=n)
    lo = x - rng.uniform(0.05, 2.0, n)
    hi = x + rng.uniform(0.05, 2.0, n)
    x_cp, free = _cauchy_point(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi),
        theta, Wt, Minv, jnp.float64)
    x_cp = np.asarray(x_cp)

    def model(u):
        return g @ u + 0.5 * u @ B @ u

    tgrid = np.linspace(0.0, 5.0, 20001)
    mv = np.array([model(np.clip(x - t * g, lo, hi) - x) for t in tgrid])
    assert model(x_cp - x) <= mv.min() + 1e-3
    # free set = variables not clamped at the GCP
    free = np.asarray(free)
    assert np.all(
        (x_cp[~free] <= lo[~free] + 1e-12)
        | (x_cp[~free] >= hi[~free] - 1e-12))


def test_subspace_step_matches_dense_projection():
    """The SMW subspace step must equal the dense free-subspace Newton
    solve projected onto the box (Morales–Nocedal 2011 semantics)."""
    rng = np.random.default_rng(2)
    n, m = 12, 4
    S, Yh = _history(rng, m, n)
    theta, Wt, Minv = _compact_matrices(
        jnp.asarray(S), jnp.asarray(Yh), jnp.asarray(0, jnp.int32),
        jnp.asarray(m, jnp.int32), m, jnp.float64)
    B = (np.asarray(theta) * np.eye(n)
         - np.asarray(Wt).T @ np.linalg.inv(np.asarray(Minv))
         @ np.asarray(Wt))
    x = rng.normal(size=n)
    g = rng.normal(size=n)
    lo = x - rng.uniform(0.05, 2.0, n)
    hi = x + rng.uniform(0.05, 2.0, n)
    x_cp, free = _cauchy_point(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi),
        theta, Wt, Minv, jnp.float64)
    x_bar = np.asarray(_subspace_step(
        jnp.asarray(x), jnp.asarray(g), x_cp, free, jnp.asarray(lo),
        jnp.asarray(hi), theta, Wt, Minv, jnp.float64))
    x_cp, free = np.asarray(x_cp), np.asarray(free)
    F = np.where(free)[0]
    r = g + B @ (x_cp - x)
    d = np.zeros(n)
    d[F] = np.linalg.solve(B[np.ix_(F, F)], -r[F])
    x_bar_ref = np.clip(x_cp + d, lo, hi)
    np.testing.assert_allclose(x_bar, x_bar_ref, atol=1e-8)


def test_lbfgsb_bounded_quadratic_vs_scipy():
    rng = np.random.default_rng(1)
    n = 40
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = 10.0 * rng.normal(size=n)
    lo, hi = -np.ones(n), np.ones(n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    res = lbfgsb_minimize(vag, jnp.zeros(n), lower=jnp.asarray(lo),
                          upper=jnp.asarray(hi),
                          opts=LBFGSOptions(maxiter=200, pgtol=1e-10,
                                            ftol=1e-18))
    sp = sp_minimize(lambda z: float(f(jnp.asarray(z))), np.zeros(n),
                     jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="L-BFGS-B", bounds=list(zip(lo, hi)),
                     options=dict(maxiter=500, gtol=1e-10, ftol=0.0))
    assert float(res.f) <= sp.fun + 1e-9 * abs(sp.fun)
    np.testing.assert_allclose(np.asarray(res.x), sp.x, atol=1e-6)
    # iterations-to-tolerance parity with the Fortran implementation
    assert int(res.niter) <= sp.nit + 10


def test_lbfgsb_bounded_rosenbrock_vs_scipy():
    """Bound active at the solution: exact f parity with SciPy."""
    n = 10

    def fr(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    vag = jax.value_and_grad(fr)
    lo = np.full(n, -2.0)
    hi = np.full(n, 0.9)
    res = lbfgsb_minimize(vag, jnp.full(n, -1.2), lower=jnp.asarray(lo),
                          upper=jnp.asarray(hi),
                          opts=LBFGSOptions(maxiter=500, pgtol=1e-9,
                                            ftol=1e-18))
    sp = sp_minimize(lambda z: float(fr(jnp.asarray(z))), np.full(n, -1.2),
                     jac=lambda z: np.asarray(vag(jnp.asarray(z))[1]),
                     method="L-BFGS-B", bounds=list(zip(lo, hi)),
                     options=dict(maxiter=2000, gtol=1e-9, ftol=0.0))
    assert abs(float(res.f) - sp.fun) <= 1e-8 * max(1.0, abs(sp.fun))
    x = np.asarray(res.x)
    assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12)


def test_lbfgsb_dispatch_and_vmap():
    """bounded_algo='subspace' dispatches through lbfgs_minimize and works
    under vmap (ensemble path)."""
    rng = np.random.default_rng(4)
    n = 8
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    b = 5.0 * rng.normal(size=n)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    opts = LBFGSOptions(maxiter=100, pgtol=1e-10, bounded_algo="subspace")
    lo, hi = -jnp.ones(n), jnp.ones(n)
    solve = lambda z: lbfgs_minimize(vag, z, lower=lo, upper=hi, opts=opts)
    r1 = solve(jnp.zeros(n))
    X0 = jnp.asarray(rng.uniform(-1, 1, size=(5, n)))
    rb = jax.jit(jax.vmap(solve))(X0)
    assert rb.f.shape == (5,)
    # every member reaches the same constrained minimum
    np.testing.assert_allclose(np.asarray(rb.f),
                               float(r1.f) * np.ones(5), rtol=1e-6)


def test_lbfgsb_matches_unbounded_when_bounds_inactive():
    """With bounds far away, subspace L-BFGS-B must find the same minimum
    as the unbounded solver."""
    def fr(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    vag = jax.value_and_grad(fr)
    n = 6
    res_u = lbfgs_minimize(vag, jnp.full(n, -1.2),
                           opts=LBFGSOptions(maxiter=500, pgtol=1e-10,
                                             ftol=1e-18))
    res_b = lbfgsb_minimize(vag, jnp.full(n, -1.2),
                            lower=jnp.full(n, -100.0),
                            upper=jnp.full(n, 100.0),
                            opts=LBFGSOptions(maxiter=500, pgtol=1e-10,
                                              ftol=1e-18))
    np.testing.assert_allclose(np.asarray(res_b.x), np.asarray(res_u.x),
                               atol=1e-6)
