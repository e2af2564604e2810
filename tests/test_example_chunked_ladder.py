"""Unit tests for examples/nakl_ensemble.py's chunked_ladder: per-chunk
checkpointing, crash resume, and the β-snapshot used by the f64 polish.
These mechanisms carried the round-2 NaKL flagship runs on a TPU worker
that kills long dispatches, so they get their own regression coverage."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

_EX = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "nakl_ensemble.py")


def _load_example():
    spec = importlib.util.spec_from_file_location("nakl_ensemble_mod", _EX)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeResult:
    def __init__(self, XP, A):
        self.XP, self.A = XP, A


def _fake_run(calls):
    """run(xp, betas) that adds each beta to xp and records the call."""
    def run(xp, betas):
        calls.append(np.asarray(betas).tolist())
        out = xp
        A = []
        for b in np.asarray(betas):
            out = out + b
            A.append(np.full(out.shape[:-1] or (1,), float(np.sum(out))))
        return _FakeResult(out, np.stack(A, axis=-1))
    return run


def test_chunked_ladder_checkpoint_resume(tmp_path):
    mod = _load_example()
    betas = np.arange(6.0)
    xp0 = np.zeros((2, 3))
    ck = str(tmp_path / "ck.npz")

    calls = []
    xp, A, snap = mod.chunked_ladder(_fake_run(calls), xp0, betas, 2,
                                     ckpt=ck, snap_at=4)
    assert [len(c) for c in calls] == [2, 2, 2]
    assert A.shape == (2, 6)
    # snapshot state = after 4 rungs: sum of betas 0..3 added
    np.testing.assert_allclose(snap, xp0 + sum(range(4)))
    np.testing.assert_allclose(np.asarray(xp), xp0 + sum(range(6)))

    # simulate a crash after 4 rungs: rewrite the checkpoint to n_done=4
    d = dict(np.load(ck))
    d["xp"] = xp0 + sum(range(4))
    d["A"] = A
    d["n_done"] = 4
    np.savez(ck, **d)
    calls2 = []
    xp2, A2, snap2 = mod.chunked_ladder(_fake_run(calls2), xp0, betas, 2,
                                        ckpt=ck, snap_at=4)
    # resumed: only rungs 4,5 re-run
    assert calls2 == [[4.0, 5.0]]
    np.testing.assert_allclose(np.asarray(xp2), xp0 + sum(range(6)))
    np.testing.assert_allclose(A2[:, :4], A[:, :4])
    # snapshot restored from the checkpoint
    np.testing.assert_allclose(snap2, xp0 + sum(range(4)))


def test_chunked_ladder_completed_checkpoint_short_circuits(tmp_path):
    mod = _load_example()
    betas = np.arange(4.0)
    xp0 = np.zeros(3)
    ck = str(tmp_path / "ck.npz")
    calls = []
    xp, A, _ = mod.chunked_ladder(_fake_run(calls), xp0, betas, 4, ckpt=ck)
    calls2 = []
    xp2, A2, _ = mod.chunked_ladder(_fake_run(calls2), xp0, betas, 4,
                                    ckpt=ck)
    assert calls2 == []                       # nothing re-run
    np.testing.assert_allclose(np.asarray(xp2), np.asarray(xp))
    np.testing.assert_allclose(A2, A)
