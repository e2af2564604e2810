"""Edge coverage: data windowing, text output formats, checkpoint+LM."""

import numpy as np
import jax.numpy as jnp

import varanneal_tpu
from varanneal_tpu.models import lorenz96
from varanneal_tpu import io as vio


def test_set_data_windowing():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 2))
    t = 0.1 * np.arange(50)
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 5)
    ann.set_data(data, t=t, nstart=10, N=20)
    np.testing.assert_array_equal(ann.data, data[10:30])
    np.testing.assert_array_equal(ann.t_data, t[10:30])
    # stim windows identically
    stim = rng.normal(size=50)
    ann.set_data(data, stim=stim, t=t, nstart=5, N=12)
    np.testing.assert_array_equal(ann.stim[:, 0], stim[5:17])


def test_text_format_writers(tmp_path):
    paths = np.arange(24.0).reshape(2, 4, 3)
    t = np.array([0.0, 0.1, 0.2, 0.3])
    out = vio.save_paths(str(tmp_path / "p.dat"), paths, t)
    loaded = np.loadtxt(tmp_path / "p.dat")
    np.testing.assert_allclose(loaded, out.reshape(-1, 4))
    ae = vio.save_action_errors(str(tmp_path / "a.txt"), [0, 1],
                                [1.0, 2.0], [0.5, 0.6], [0.5, 1.4])
    np.testing.assert_allclose(np.loadtxt(tmp_path / "a.txt"), ae)


def test_checkpoint_with_lm_inner(tmp_path):
    rng = np.random.default_rng(1)
    t = 0.025 * np.arange(13)
    Y = rng.normal(size=(13, 3))
    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 6)
    ann.set_data(Y, t=t)
    X0 = rng.uniform(-5, 5, size=(13, 6))
    ann.anneal(X0, np.array([8.0]), alpha=1.7, beta_array=np.arange(6),
               RM=4.0, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0], method="LM",
               opt_args=dict(maxiter=50),
               checkpoint_path=str(tmp_path / "lm.npz"),
               checkpoint_every=2)
    assert np.all(np.isfinite(ann.A_array))
    assert (tmp_path / "lm.npz").exists()
    # resume is a no-op when complete
    A_first = ann.A_array.copy()
    ann.anneal(X0, np.array([8.0]), alpha=1.7, beta_array=np.arange(6),
               RM=4.0, RF0=1e-3, Lidx=[0, 2, 4], Pidx=[0], method="LM",
               opt_args=dict(maxiter=50),
               checkpoint_path=str(tmp_path / "lm.npz"),
               checkpoint_every=2, resume=True)
    np.testing.assert_array_equal(ann.A_array, A_first)


def test_reference_module_aliases():
    """Reference import paths work: varanneal.va_ode/va_nnet -> here."""
    from varanneal_tpu import va_ode, va_nnet
    from varanneal_tpu.api import Annealer as A1
    from varanneal_tpu.nnet import Annealer as A2
    assert va_ode.Annealer is A1
    assert va_nnet.Annealer is A2


def test_version_matches_packaging_metadata():
    import os
    import tomllib
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        cfg = tomllib.load(fh)
    assert cfg["project"]["version"] == varanneal_tpu.__version__
