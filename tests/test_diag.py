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


def test_plot_action_levels(tmp_path):
    rng = np.random.default_rng(1)
    A = np.exp(rng.normal(size=(6, 20)))
    f = str(tmp_path / "levels.png")
    ax = plot_action_levels(A, fname=f)
    assert os.path.exists(f) and os.path.getsize(f) > 1000
    assert ax.get_yscale() == "log"
