"""Unit tests for the observability sweep's per-L checkpoint helpers
(benchmarks/l96_observability.py): flatten/unflatten round-trip, atomic
save, and config-mismatch rejection. The sweep itself is a TPU
benchmark; these pin the resume plumbing it relies on after a
worker-hang kill (CLAUDE.md measured gotcha)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.l96_observability import (     # noqa: E402
    _flatten, _unflatten, _save_ckpt, _ckpt_meta)


def _fake_results():
    rng = np.random.default_rng(0)
    return {
        4: dict(Lidx=np.arange(4), A_curve=rng.random((4, 21)),
                A_rank=rng.random(4), rmse_unobs=rng.random(4),
                rmse_full=rng.random(4), F_est=rng.random(4),
                ok=np.array([False, True, False, True]),
                frac_ok=0.5, frac_low=0.75, best=1, wall=1.25,
                nfev=12345),
        8: dict(Lidx=np.arange(8), A_curve=rng.random((4, 21)),
                A_rank=rng.random(4), rmse_unobs=rng.random(4),
                rmse_full=rng.random(4), F_est=rng.random(4),
                ok=np.ones(4, bool), frac_ok=1.0, frac_low=1.0,
                best=0, wall=0.5, nfev=999),
    }


def test_flatten_unflatten_roundtrip(tmp_path):
    results = _fake_results()
    meta = dict(D=20, seed=3)
    path = str(tmp_path / "ck.npz")
    _save_ckpt(path, results, meta, 8.17)
    d = np.load(path, allow_pickle=False)
    assert json.loads(str(d["meta"])) == meta
    assert float(d["F_true"]) == 8.17
    back = _unflatten(d)
    assert sorted(back) == [4, 8]
    for L in (4, 8):
        for k, v in results[L].items():
            if isinstance(v, np.ndarray):
                np.testing.assert_array_equal(back[L][k], v)
            else:
                # scalars come back as python scalars of the same value
                assert back[L][k] == v, (L, k)
                assert not isinstance(back[L][k], np.ndarray)
    # no stray temp file left behind (atomic save)
    assert os.listdir(tmp_path) == ["ck.npz"]


def test_ckpt_meta_excludes_chunk():
    class A:
        D = 20
        record_n = 161
        ninit = 32
        nbeta = 101
        maxiter = 500
        tail = 10
        seed = 3
        data_seed = 2027
        solver = "fused"
        rmse_thresh = 1.0
        chunk = 26

    m1 = _ckpt_meta(A)
    A.chunk = 13                       # chunk-invariant (warm-started)
    assert _ckpt_meta(A) == m1
    A.seed = 4                         # anything else invalidates
    assert _ckpt_meta(A) != m1
