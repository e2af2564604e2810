"""Facade-level coverage of the remaining reference semantics: time-
dependent parameters, dt_model (finer model grid), forwardmap maps,
matrix RM through the full ladder."""

import numpy as np
import pytest
import jax

import varanneal_tpu
from varanneal_tpu.models import lorenz96


def _data(D=6, N=17, L=3, seed=0):
    rng = np.random.default_rng(seed)
    t = 0.025 * np.arange(N)
    Y = rng.normal(size=(N, L))
    return t, Y, rng


def test_time_dependent_parameter_estimation():
    """Estimate a time-varying forcing F(t): P0 2-D -> per-timestep
    parameter columns in the decision vector (reference time-dep support,
    SURVEY.md §2)."""
    t, Y, rng = _data()
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(17, 6))
    P0 = np.full((17, 1), 6.0)             # time-dep initial guess
    ann.anneal(X0, P0, alpha=1.7, beta_array=np.arange(6), RM=4.0,
               RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0],
               opt_args=dict(maxiter=100))
    assert ann.minpaths_P.shape == (6, 17, 1)
    assert np.all(np.isfinite(ann.minpaths_P))
    # params saved with the time column
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        out = ann.save_params(os.path.join(d, "p.npy"))
    assert out.shape == (6, 17, 2)


def test_dt_model_finer_grid_facade():
    t, Y, rng = _data(N=11)
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(11, 6))
    ann.anneal(X0, np.array([8.0]), alpha=1.7, beta_array=np.arange(4),
               RM=4.0, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0],
               dt_model=0.025 / 4, opt_args=dict(maxiter=60))
    # model grid is 4x finer: N_f = (11-1)*4 + 1
    assert ann.minpaths_X.shape == (4, 41, 6)
    # observed rows on the model grid match data rows at every 4th point
    assert ann.spec.obs_stride == 4


def test_forwardmap_discrete_time():
    """forwardmap: x_{n+1} = f(x_n) maps (e.g. a logistic-family map)."""
    def logistic_map(t, x, p):
        import jax.numpy as jnp
        r = p[0] if np.ndim(p) == 1 else p
        return r * x * (1.0 - x)

    rng = np.random.default_rng(2)
    N, r_true = 41, 3.7
    x = 0.3
    xs = []
    for _ in range(N):
        xs.append(x)
        x = r_true * x * (1 - x)
    xs = np.asarray(xs)[:, None]
    Y = xs + 0.01 * rng.normal(size=(N, 1))

    ann = varanneal_tpu.Annealer()
    ann.set_model(logistic_map, 1)
    ann.set_data(Y, t=np.arange(N, dtype=float))
    X0 = Y.copy()
    ann.anneal(X0, np.array([3.0]), alpha=2.0, beta_array=np.arange(12),
               RM=1e4, RF0=1e-2, Lidx=[0], Pidx=[0], disc="forwardmap",
               opt_args=dict(maxiter=400, gtol=1e-10))
    r_est = ann.minpaths_P[-1, 0]
    assert abs(r_est - r_true) < 0.05, r_est


def test_matrix_RM_full_ladder():
    t, Y, rng = _data()
    L = 3
    M = rng.normal(size=(L, L))
    RM = M @ M.T + 3 * np.eye(L)            # constant full matrix
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(17, 6))
    ann.anneal(X0, np.array([8.0]), alpha=1.7, beta_array=np.arange(4),
               RM=RM, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0],
               opt_args=dict(maxiter=60))
    assert np.all(np.isfinite(ann.A_array))
    assert ann.exitflags.max() <= 2


def test_canonical_R_ambiguity_warning():
    """When N == K a 2-D R is ambiguous: default warns and reads
    time-dependent; time_dependent=True/False silences and selects."""
    import warnings
    from varanneal_tpu.ops.spec import canonical_R

    R = np.arange(1.0, 10.0).reshape(3, 3)
    with pytest.warns(UserWarning, match="time-dependent"):
        out = canonical_R(R, 3, 3, "RM")
    np.testing.assert_array_equal(out, R)          # (N, K) reading

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out_t = canonical_R(R, 3, 3, "RM", time_dependent=True)
        out_m = canonical_R(R, 3, 3, "RM", time_dependent=False)
    np.testing.assert_array_equal(out_t, R)
    assert out_m.shape == (3, 3, 3)                # (K, K) tiled over time
    np.testing.assert_array_equal(out_m[1], R)

    # unambiguous shapes never warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        canonical_R(R[:2], 2, 3, "RM")


def test_facade_R_time_dependent_kwarg():
    """R_time_dependent plumbs through anneal() for RM and RF0."""
    t, Y, rng = _data(D=3, N=3, L=3)
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 3)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(3, 3))
    RM = np.full((3, 3), 4.0)                      # ambiguous: N == L == 3
    with pytest.warns(UserWarning, match="RM"):
        ann.anneal(X0, np.array([6.0]), 1.7, np.arange(2), RM, 1e-4,
                   [0, 1, 2], Pidx=[0], opt_args=dict(maxiter=5))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ann.anneal(X0, np.array([6.0]), 1.7, np.arange(2), RM, 1e-4,
                   [0, 1, 2], Pidx=[0], opt_args=dict(maxiter=5),
                   R_time_dependent=True)


def test_clamped_parameters_basin_probe():
    """Pidx=[] anneals the STATES with every parameter clamped — the
    basin-comparison probe behind the round-3 record-sizing rule
    (PARITY.md "truth-basin action"): candidate parameter sets are
    ranked by the best action attainable with states free, parameters
    fixed. Checks the degenerate packing (NPest=0) end-to-end and that
    the probe ranks truth above a wrong parameter set on clean-ish data.
    """
    from varanneal_tpu.twin import lorenz96_twin

    D, N = 6, 41
    rng = np.random.default_rng(3)
    tw = lorenz96_twin(D=D, N_data=N, dt=0.025, sigma=0.1, n_obs=4,
                       seed=5)
    X0 = rng.uniform(-8, 8, size=(N, D))

    def probe(F):
        ann = varanneal_tpu.Annealer()
        ann.set_model(lorenz96, D)
        ann.set_data(tw["Y"], t=tw["t"])
        ann.anneal(X0, np.array([F]), alpha=1.9,
                   beta_array=np.arange(14), RM=tw["RM"], RF0=1e-4,
                   Lidx=tw["Lidx"], Pidx=[], opt_args=dict(maxiter=300))
        assert ann.minpaths.shape[-1] == N * D     # no parameter tail
        return float(np.asarray(ann.A_array)[-1])

    a_truth, a_wrong = probe(tw["F"]), probe(tw["F"] * 2.0)
    assert np.isfinite(a_truth) and a_truth < a_wrong
