"""Ensemble diagnostics: level clustering, estimate selection, plotting."""

import os

import numpy as np

from varanneal_tpu.diag import (action_levels, estimate_from_ensemble,
                                path_rmse, plot_action_levels)


def test_action_levels_clustering():
    final = np.array([1.0, 1.02, 5.0, 1.01, 5.2, 30.0])
    lv = action_levels(final, rel_gap=0.05)
    assert len(lv.levels) == 3
    np.testing.assert_allclose(lv.levels, [1.0, 5.0, 30.0])
    np.testing.assert_array_equal(lv.counts, [3, 2, 1])
    assert set(lv.best_members) == {0, 1, 3}
    # every member assigned to the right level
    assert lv.assignment[4] == 1 and lv.assignment[5] == 2


def test_estimate_selection():
    A = np.array([[1, 2, 9.0], [1, 2, 3.0], [1, 2, 3.05]])
    paths = np.array([10.0, 20.0, 30.0])
    best, sel, lv = estimate_from_ensemble(A, paths)
    assert best == 1 and sel == 20.0
    assert lv.counts[0] == 2


def test_path_rmse_split():
    rng = np.random.default_rng(0)
    Xt = rng.normal(size=(11, 4))
    Xe = Xt + 0.1
    out = path_rmse(Xe, Xt, Lidx=[0, 2], D=4)
    assert abs(out["observed"] - 0.1) < 1e-12
    assert abs(out["unobserved"] - 0.1) < 1e-12
    assert isinstance(path_rmse(Xe, Xt), float)


def test_forward_sensitivity_analytic():
    """Exponential decay dx/dt = -p x: dV/dp at t_n is -t_n x0 e^{-p t_n};
    the relative scaling multiplies by p."""
    from varanneal_tpu.diag import forward_sensitivity

    def f(t, x, p):
        import jax.numpy as jnp
        p = jnp.asarray(p)
        return -p[0] * x

    p0, x0, N, dt = 0.7, 2.0, 21, 0.1
    t = dt * np.arange(N)
    S = forward_sensitivity(f, [x0], t, [p0], [0], obs=(0,), sub=20,
                            relative=False)
    expect = (-t * x0 * np.exp(-p0 * t))[:, None]
    np.testing.assert_allclose(S, expect, rtol=1e-8, atol=1e-12)
    S_rel = forward_sensitivity(f, [x0], t, [p0], [0], obs=(0,), sub=20)
    np.testing.assert_allclose(S_rel, p0 * expect, rtol=1e-8, atol=1e-12)


def test_forward_sensitivity_nakl_fd_parity():
    """Stimulus-driven multi-parameter path vs central finite differences
    of the same RK4 simulation (independent of AD)."""
    from varanneal_tpu.diag import forward_sensitivity
    from varanneal_tpu.models import nakl, NAKL_P_TRUE

    N, dt = 41, 0.04
    t = dt * np.arange(N)
    rng = np.random.default_rng(0)
    stim = 20.0 * np.sin(0.3 * np.arange(N)) + rng.normal(0, 2.0, N)
    x0 = [-65.0, 0.1, 0.6, 0.3]
    pidx = [1, 4, 9]                      # gNa, EK, tm0
    S = forward_sensitivity(nakl, x0, t, NAKL_P_TRUE, pidx, stim=stim,
                            obs=(0, 2), sub=4, relative=False)
    assert S.shape == (N * 2, len(pidx))
    for j, pj in enumerate(pidx):
        h = 1e-5 * abs(NAKL_P_TRUE[pj])
        cols = []
        for s in (+1, -1):
            P = np.asarray(NAKL_P_TRUE, np.float64).copy()
            P[pj] += s * h
            cols.append(_simulate_obs(nakl, x0, t, P, stim, (0, 2), 4))
        fd = (cols[0] - cols[1]) / (2 * h)
        np.testing.assert_allclose(S[:, j], fd, rtol=5e-4, atol=5e-4)


def _simulate_obs(f, x0, t, P, stim, obs, sub):
    """Reference RK4 trajectory in plain NumPy (independent oracle)."""
    t = np.asarray(t, np.float64)
    N = len(t)
    dt = t[1] - t[0]
    h = dt / sub
    n_fine = (N - 1) * sub
    t_fine = t[0] + h * np.arange(n_fine)
    stim_f = np.interp(t_fine, t, np.asarray(stim, np.float64))
    x = np.asarray(x0, np.float64).copy()
    out = [x[list(obs)].copy()]

    def f1(tk, xk, sk):
        import jax.numpy as jnp
        r = f(jnp.asarray([tk]), jnp.asarray(xk)[None, :],
              (jnp.asarray(P), jnp.asarray([[sk]])))
        return np.asarray(r, np.float64)[0]

    for i in range(n_fine):
        tk, sk = t_fine[i], stim_f[i]
        k1 = f1(tk, x, sk)
        k2 = f1(tk + h / 2, x + h / 2 * k1, sk)
        k3 = f1(tk + h / 2, x + h / 2 * k2, sk)
        k4 = f1(tk + h, x + h * k3, sk)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        if (i + 1) % sub == 0:
            out.append(x[list(obs)].copy())
    return np.concatenate(out)


def test_fisher_report_stacking_and_crlb():
    """F = sum_k S_k^T S_k / sigma^2; CRLB and flat directions from a
    constructed sensitivity with a known null direction."""
    from varanneal_tpu.diag import fisher_report

    rng = np.random.default_rng(3)
    M, NP = 50, 3
    base = rng.normal(size=(M, NP))
    base[:, 2] = base[:, 0]              # column 2 degenerate with 0
    S1, S2 = base[:25], base[25:]
    rep = fisher_report([S1, S2], sigma=2.0, names=["a", "b", "c"],
                        flat_cut=1e-6)
    np.testing.assert_allclose(rep.F, base.T @ base / 4.0, rtol=1e-12)
    w = np.linalg.eigvalsh(base.T @ base / 4.0)
    np.testing.assert_allclose(rep.eigvals, w, rtol=1e-10, atol=1e-12)
    assert rep.eigvals[0] < 1e-10        # the degenerate direction
    # flat report picks it up with a larger cut
    rep2 = fisher_report(base, sigma=2.0, names=["a", "b", "c"],
                         flat_cut=1.0)
    assert len(rep2.flat) == 1
    comp_names = {nm for _, nm in rep2.flat[0][1]}
    assert {"a", "c"} <= comp_names
    # CRLB of an identity-information problem is sigma-scaled correctly
    rep3 = fisher_report(np.eye(4), sigma=0.5)
    np.testing.assert_allclose(rep3.crlb, 0.5 * np.ones(4), rtol=1e-12)


def test_plot_action_levels(tmp_path):
    rng = np.random.default_rng(1)
    A = np.exp(rng.normal(size=(6, 20)))
    f = str(tmp_path / "levels.png")
    ax = plot_action_levels(A, fname=f)
    assert os.path.exists(f) and os.path.getsize(f) > 1000
    assert ax.get_yscale() == "log"
