"""Config system + CLI runner end-to-end: JSON config -> anneal -> output
files with reference-compatible layouts."""

import json
import subprocess
import sys
import os

import numpy as np

from varanneal_tpu.config import AnnealConfig


def test_anneal_config_roundtrip(tmp_path):
    cfg = dict(alpha=1.5, beta_array={"stop": 5}, RM=4.0, RF0=1e-5,
               Lidx=[0, 1], Pidx=[0], disc="trapezoid",
               opt_args={"maxiter": 30})
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    c = AnnealConfig.from_json(str(p))
    assert list(c.beta_array) == [0, 1, 2, 3, 4]
    assert c.RM == 4.0

    bad = dict(cfg, nonsense=1)
    p.write_text(json.dumps(bad))
    try:
        AnnealConfig.from_json(str(p))
        assert False, "should reject unknown keys"
    except ValueError as e:
        assert "nonsense" in str(e)


def test_cli_runner_end_to_end(tmp_path):
    # build a tiny data file: col 0 = time, cols 1.. = observations
    rng = np.random.default_rng(0)
    N, D = 13, 5
    t = 0.025 * np.arange(N)
    Y = rng.normal(size=(N, 2))
    np.save(tmp_path / "data.npy", np.column_stack([t, Y]))

    cfg = dict(
        model={"name": "lorenz96", "D": D},
        data={"file": str(tmp_path / "data.npy")},
        P0=[8.0],
        out=str(tmp_path / "run"),
        alpha=1.6, beta_array={"stop": 3}, RM=4.0, RF0=1e-4,
        Lidx=[0, 2], Pidx=[0], opt_args={"maxiter": 20},
    )
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.getcwd())
    r = subprocess.run(
        [sys.executable, "-m", "varanneal_tpu",
         str(tmp_path / "cfg.json")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    paths = np.load(tmp_path / "run_paths.npy")
    assert paths.shape == (3, N, D + 1)
    np.testing.assert_allclose(paths[0, :, 0], t)
    ae = np.loadtxt(tmp_path / "run_action_errors.dat")
    assert ae.shape == (3, 4)
    assert np.all(np.isfinite(ae))
