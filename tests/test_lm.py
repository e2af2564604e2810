"""Gauss–Newton / Levenberg–Marquardt solver: residual-action equivalence,
convergence on least-squares problems, and the LM-driven annealing ladder
vs the L-BFGS ladder."""

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action, pack
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.opt.lm import lm_minimize, LMOptions, make_residual_fn
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import random_ensemble_inits


def _spec(disc="trapezoid", rm_kind="scalar", seed=0, N_data=21, D=6):
    rng = np.random.default_rng(seed)
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    RM = 4.0 if rm_kind == "scalar" else rng.uniform(1, 3, (N_data, 3))
    return build_spec(lorenz96, D, Y, t, [0, 2, 4], RM, disc=disc,
                      P=np.array([8.0]), pidx=[0]), rng


def _spd(rng, N, K, scale=1.0):
    """Batch of random SPD matrices (N, K, K)."""
    M = rng.normal(size=(N, K, K))
    return scale * (M @ np.swapaxes(M, 1, 2) + K * np.eye(K))


def test_residual_norm_equals_action():
    for disc in ("euler", "trapezoid", "SimpsonHermite", "forwardmap"):
        for rm_kind in ("scalar", "diag"):
            spec, rng = _spec(disc=disc, rm_kind=rm_kind)
            residual = make_residual_fn(spec)
            action, _ = make_action(spec)
            XP = jnp.asarray(rng.normal(size=spec.n_dof))
            for rf in (3e-3,
                       jnp.asarray(rng.uniform(0.5, 2.0,
                                               (spec.N_f - 1, spec.D)))):
                r = residual(XP, rf)
                np.testing.assert_allclose(
                    float(jnp.vdot(r, r)), float(action(XP, rf)),
                    rtol=1e-12)


def test_residual_norm_equals_action_matrix_R():
    """Matrix RM and matrix RF fold into the residual via Cholesky: the
    ||r||^2 identity must hold for every disc."""
    from varanneal_tpu.models import lorenz96 as l96
    for disc in ("trapezoid", "SimpsonHermite"):
        rng = np.random.default_rng(11)
        N_data, D, L = 13, 6, 3
        t = 0.025 * np.arange(N_data)
        Y = rng.normal(size=(N_data, L))
        RM = _spd(rng, N_data, L)
        spec = build_spec(l96, D, Y, t, [0, 2, 4], RM, disc=disc,
                          P=np.array([8.0]), pidx=[0])
        residual = make_residual_fn(spec)
        action, _ = make_action(spec)
        XP = jnp.asarray(rng.normal(size=spec.n_dof))
        rf = jnp.asarray(_spd(rng, spec.N_f - 1, D, scale=1e-3))
        r = residual(XP, rf)
        np.testing.assert_allclose(
            float(jnp.vdot(r, r)), float(action(XP, rf)), rtol=1e-10)


def test_lm_ladder_matrix_R():
    """method='LM' runs a ladder with a full matrix RM (previously raised)."""
    from varanneal_tpu.models import lorenz96 as l96
    rng = np.random.default_rng(12)
    N_data, D = 15, 6
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    RM = _spd(rng, N_data, 3)
    spec = build_spec(l96, D, Y, t, [0, 2, 4], RM, disc="trapezoid",
                      P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    residual = make_residual_fn(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 1, seed=4)[0])
    betas = jnp.arange(5.0)
    r_lm = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8, inner="lm",
        residual_fn=residual,
        lm_opts=LMOptions(maxiter=60, cg_iters=25, pgtol=1e-9),
        store_paths=False))(xp0)
    r_lb = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8,
        opts=LBFGSOptions(maxiter=1500, pgtol=1e-9),
        store_paths=False))(xp0)
    A_lm, A_lb = np.asarray(r_lm.A), np.asarray(r_lb.A)
    assert np.all(np.isfinite(A_lm))
    assert np.all(np.abs(A_lm - A_lb) / A_lb < 0.1), (A_lm, A_lb)


def test_lm_converges_on_rosenbrock_ls():
    """Rosenbrock as least squares: r = [10(x1-x0^2), 1-x0, ...]."""
    n = 8

    def residual(x):
        return jnp.concatenate([10.0 * (x[1:] - x[:-1] ** 2),
                                1.0 - x[:-1]])

    res = lm_minimize(residual, jnp.full(n, -1.2),
                      opts=LMOptions(maxiter=200, pgtol=1e-10,
                                     cg_iters=30, ftol=1e-16))
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)
    assert float(res.f) < 1e-16


def test_lm_bounded():
    def residual(x):
        return x - jnp.asarray([2.0, -3.0, 0.5])

    res = lm_minimize(residual, jnp.zeros(3), lower=-jnp.ones(3),
                      upper=jnp.ones(3),
                      opts=LMOptions(maxiter=100, pgtol=1e-12))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -1.0, 0.5],
                               atol=1e-8)


def test_lm_ladder_matches_lbfgs_ladder():
    """The LM-driven ladder must reach action levels at least as low as the
    L-BFGS ladder (same warm-start protocol)."""
    spec, rng = _spec(seed=3)
    action, parts = make_action(spec)
    residual = make_residual_fn(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 1, seed=4)[0])
    betas = jnp.arange(10.0)

    r_lb = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8,
        opts=LBFGSOptions(maxiter=2000, pgtol=1e-9),
        store_paths=False))(xp0)
    r_lm = jax.jit(lambda z: run_ladder(
        action, parts, z, betas, 1e-3, 1.8, inner="lm",
        residual_fn=residual,
        lm_opts=LMOptions(maxiter=100, cg_iters=25, pgtol=1e-9),
        store_paths=False))(xp0)

    A_lb = np.asarray(r_lb.A)
    A_lm = np.asarray(r_lm.A)
    # LM must be at least as good as L-BFGS at every beta (measured: it is
    # strictly better at most — near-exact GN curvature), same basin
    assert np.all(A_lm <= A_lb * 1.02), (A_lm, A_lb)
    assert np.all(np.abs(A_lm - A_lb) / A_lb < 0.2)
    # LM's eval count must be in a sane range (it does real work)
    assert int(np.asarray(r_lm.nfev).sum()) > 0
