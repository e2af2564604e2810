"""Profiling hooks: trace context writes an XProf capture; ladder_stats
summarizes results."""

import glob
import os

import numpy as np
import jax.numpy as jnp

from varanneal_tpu import profiling
from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import random_ensemble_inits


def test_trace_and_stats(tmp_path):
    rng = np.random.default_rng(0)
    t = 0.025 * np.arange(9)
    Y = rng.normal(size=(9, 2))
    spec = build_spec(lorenz96, 5, Y, t, [0, 2], 4.0,
                      P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 1, seed=1)[0])
    opts = LBFGSOptions(maxiter=10)

    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        res = run_ladder(action, parts, xp0, jnp.arange(3.0), 1e-4, 1.7,
                         opts=opts, store_paths=False)
        float(res.A[-1])

    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace files written"

    stats = profiling.ladder_stats(res)
    assert stats["n_beta"] == 3
    assert stats["total_nfev"] >= stats["total_niter"]
    assert (stats["n_converged"] + stats["n_maxiter"]
            + stats["n_ls_fail"]) == 3
