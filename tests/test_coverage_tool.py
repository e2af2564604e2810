"""Unit tests for the campaign coverage tool (benchmarks/nakl_coverage).

`coverage_stats` is the single implementation behind every hit-rate
number in PARITY.md's round-3 campaign sections and the prior-width
dose-response figure, so its draw/estimate extraction and error
arithmetic are pinned here on synthetic saves with hand-computable
answers. (Reference context: the reference has no ensemble analytics
at all — SURVEY.md §2; this is framework-native tooling.)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))
from nakl_coverage import coverage_stats  # noqa: E402

from varanneal_tpu.models import NAKL_P_TRUE, nakl_param_boxes


def _truth_est(Pidx, log_idx):
    return np.asarray([np.log(NAKL_P_TRUE[pi]) if pi in log_idx
                       else NAKL_P_TRUE[pi] for pi in Pidx])


def _make_save(tmp_path, full, **meta):
    """Synthetic 3-member anchored save: member 0 at truth, member 1 at
    2x truth (linear scale), member 2 at truth; draws at known offsets."""
    Pidx = list(range(1, 19))
    _, log_idx = nakl_param_boxes(Pidx, log_tau=meta.get("log_tau", False),
                                  log_g=meta.get("log_g", False))
    tr = _truth_est(Pidx, log_idx)
    est = np.stack([tr, tr, tr])
    # member 1: exactly 2x truth on the LINEAR scale in every coordinate
    est[1] = np.asarray([np.log(2 * NAKL_P_TRUE[pi]) if pi in log_idx
                         else 2 * NAKL_P_TRUE[pi] for pi in Pidx])
    draws = np.stack([tr, tr, tr])
    d = dict(A=np.zeros((3, 5)), prior_own_draw=True, fix_cm=True,
             **meta)
    path = os.path.join(tmp_path, "save.npz")
    if full:
        # full phase-1 layout: [states..., params, anchors]
        states = np.zeros((3, 7))
        xp = np.concatenate([states, est, draws], axis=1)
        np.savez(path, xp=xp, **d)
    else:
        # facts archive (archive_facts.py output)
        np.savez(path, draws=draws, p_final=est, **d)
    return path


@pytest.mark.parametrize("full", [True, False])
def test_hits_and_errors(tmp_path, full):
    p = _make_save(str(tmp_path), full=full, log_tau=True, log_g=True,
                   seed=5)
    s = coverage_stats(p, hit_thresh=15.0)
    assert s["B"] == 3 and s["npar"] == 18
    # members 0/2 sit at truth (0% error), member 1 at +100% everywhere
    assert np.allclose(s["med_err"][[0, 2]], 0.0, atol=1e-9)
    assert np.allclose(s["med_err"][1], 100.0, atol=1e-6)
    assert list(s["hits"]) == [True, False, True]
    # draws were placed AT truth: zero distance in wide-box units
    assert np.allclose(s["d_inf"], 0.0, atol=1e-12)
    assert s["seed_truth"] is False and s["box_shrink"] == 1.0


def test_meta_passthrough_and_guard(tmp_path):
    p = _make_save(str(tmp_path), full=False, log_tau=True, log_g=True,
                   seed=7, seed_truth=True, box_shrink=6.0,
                   box_offset=1.0)
    s = coverage_stats(p)
    assert s["seed_truth"] is True
    assert s["box_shrink"] == 6.0 and s["box_offset"] == 1.0
    # shrunk draw boxes are narrower than the wide reference boxes
    assert (s["w_draw"] <= s["w_wide"] + 1e-12).all()
    assert (s["w_draw"] < s["w_wide"] - 1e-12).any()

    # a non-anchored save has no draw record to analyze
    q = os.path.join(str(tmp_path), "plain.npz")
    np.savez(q, A=np.zeros((2, 3)), prior_own_draw=False)
    with pytest.raises(AssertionError):
        coverage_stats(q)


def test_prior_sweep_fig_smoke(tmp_path, monkeypatch):
    """The dose-response figure renders from synthetic campaign saves
    (one wide-box, one tight-box, one offset probe) and refuses
    truth-seeded oracle saves."""
    import nakl_prior_sweep_fig as fig

    p1 = _make_save(str(tmp_path), full=False, log_tau=True, log_g=True,
                    seed=1)
    os.rename(p1, os.path.join(str(tmp_path), "wide.npz"))
    p2 = _make_save(str(tmp_path), full=False, log_tau=True, log_g=True,
                    seed=2, box_shrink=6.0)
    os.rename(p2, os.path.join(str(tmp_path), "tight.npz"))
    p3 = _make_save(str(tmp_path), full=False, log_tau=True, log_g=True,
                    seed=3, box_shrink=6.0, box_offset=1.0)
    out = os.path.join(str(tmp_path), "fig.png")
    monkeypatch.setattr(sys, "argv", [
        "fig", os.path.join(str(tmp_path), "wide.npz"),
        os.path.join(str(tmp_path), "tight.npz"), p3, "--out", out])
    fig.main()
    assert os.path.getsize(out) > 10_000

    p4 = _make_save(str(tmp_path), full=False, log_tau=True, log_g=True,
                    seed=4, seed_truth=True)
    monkeypatch.setattr(sys, "argv", ["fig", p4, "--out", out])
    with pytest.raises(AssertionError, match="oracle"):
        fig.main()
