"""Per-component RF cap (``rf_max``) in the annealing ladder.

RF(β) = min(RF0·α^β, rf_max) — clamped components hold a fixed precision
while the rest anneal (anneal/ladder.py).  Semantics are verified against
the closed-form minimizer of a scalar quadratic action, so the test is
independent of floating-point ``pow`` details.
"""

import numpy as np
import jax.numpy as jnp

from varanneal_tpu.anneal.ladder import run_ladder
from varanneal_tpu.opt.lbfgs import LBFGSOptions


def _quad_action(z, rf):
    # rf-weighted pull toward 1, unit pull toward 2: z* = (rf + 2)/(rf + 1)
    me = (z[0] - 2.0) ** 2
    fe = rf * (z[0] - 1.0) ** 2
    return me + fe


def _quad_parts(z, rf):
    me = (z[0] - 2.0) ** 2
    fe = rf * (z[0] - 1.0) ** 2
    return me + fe, me, fe


def _closed_form_A(rf):
    zs = (rf + 2.0) / (rf + 1.0)
    return (zs - 2.0) ** 2 + rf * (zs - 1.0) ** 2


def test_rf_max_scalar_cap_matches_closed_form():
    rf0, alpha, cap = 0.1, 2.0, 0.9
    betas = np.arange(6, dtype=np.float64)
    res = run_ladder(_quad_action, _quad_parts, jnp.array([5.0]),
                     betas, rf0, alpha, rf_max=cap,
                     opts=LBFGSOptions(maxiter=60, pgtol=1e-12,
                                       ftol=1e-16))
    rf_eff = np.minimum(rf0 * alpha ** betas, cap)
    np.testing.assert_allclose(np.asarray(res.A),
                               _closed_form_A(rf_eff), rtol=1e-8)
    # the cap binds on the later rungs: identical action there
    assert rf_eff[-1] == cap and rf_eff[0] == rf0
    np.testing.assert_allclose(res.A[-1], res.A[-2], rtol=1e-10)


def test_rf_max_per_component_cap():
    """Cap only component 0 of a 2-component diagonal RF: component 0's
    effective rf freezes, component 1 keeps annealing."""
    rf0 = np.array([0.1, 0.1])
    cap = np.array([0.4, np.inf])
    alpha = 2.0
    betas = np.arange(5, dtype=np.float64)

    def action(z, rf):
        me = (z[0] - 2.0) ** 2 + (z[1] - 2.0) ** 2
        fe = rf[0] * (z[0] - 1.0) ** 2 + rf[1] * (z[1] - 1.0) ** 2
        return me + fe

    def parts(z, rf):
        me = (z[0] - 2.0) ** 2 + (z[1] - 2.0) ** 2
        fe = rf[0] * (z[0] - 1.0) ** 2 + rf[1] * (z[1] - 1.0) ** 2
        return me + fe, me, fe

    res = run_ladder(action, parts, jnp.array([5.0, 5.0]), betas,
                     rf0, alpha, rf_max=cap, store_paths=True,
                     opts=LBFGSOptions(maxiter=80, pgtol=1e-12,
                                       ftol=1e-16))
    paths = np.asarray(res.paths)                      # (Nbeta, 2)
    rf_eff0 = np.minimum(rf0[0] * alpha ** betas, cap[0])
    rf_eff1 = rf0[1] * alpha ** betas
    np.testing.assert_allclose(paths[:, 0], (rf_eff0 + 2) / (rf_eff0 + 1),
                               rtol=1e-8)
    np.testing.assert_allclose(paths[:, 1], (rf_eff1 + 2) / (rf_eff1 + 1),
                               rtol=1e-8)
    # component 0 frozen after the cap binds; component 1 still moving
    assert abs(paths[-1, 0] - paths[-2, 0]) < 1e-9
    assert abs(paths[-1, 1] - paths[-2, 1]) > 1e-3


def test_rf_min_floor_matches_closed_form():
    """rf_min floor: the floored component starts AT the floor and
    resumes annealing once rf0·α^β overtakes it."""
    rf0, alpha, floor = 0.1, 2.0, 0.9
    betas = np.arange(8, dtype=np.float64)
    res = run_ladder(_quad_action, _quad_parts, jnp.array([5.0]),
                     betas, rf0, alpha, rf_min=floor,
                     opts=LBFGSOptions(maxiter=60, pgtol=1e-12,
                                       ftol=1e-16))
    rf_eff = np.maximum(rf0 * alpha ** betas, floor)
    np.testing.assert_allclose(np.asarray(res.A),
                               _closed_form_A(rf_eff), rtol=1e-8)
    # floor binds early (rungs 0..3: rf0·2^β < 0.9), anneals after
    assert rf_eff[0] == floor and rf_eff[-1] == rf0 * alpha ** betas[-1]
    np.testing.assert_allclose(res.A[0], res.A[1], rtol=1e-10)
    assert res.A[-1] > res.A[-2]


def test_facade_RF_max_kwarg():
    """RF_max flows through the facade (same shape zoo as RF0)."""
    import varanneal_tpu
    from varanneal_tpu.models import lorenz96
    rng = np.random.default_rng(0)
    t = 0.025 * np.arange(17)
    Y = rng.normal(size=(17, 3))
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(17, 6))
    ann.anneal(X0, np.array([8.0]), alpha=2.0, beta_array=np.arange(6),
               RM=4.0, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0],
               RF_max=1e-2, opt_args=dict(maxiter=60))
    A = ann.A_array
    assert np.all(np.isfinite(A))
    ann2 = varanneal_tpu.Annealer()
    ann2.set_model(lorenz96, 6)
    ann2.set_data(Y, t=t)
    ann2.anneal(X0, np.array([8.0]), alpha=2.0, beta_array=np.arange(6),
                RM=4.0, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0],
                opt_args=dict(maxiter=60))
    # early rungs (cap slack: 1e-3·2^β < 1e-2 for β<4) agree; capped tail
    # rungs differ from the uncapped ladder
    np.testing.assert_allclose(A[:3], ann2.A_array[:3], rtol=1e-6)
    assert not np.allclose(A[-1], ann2.A_array[-1], rtol=1e-6)
