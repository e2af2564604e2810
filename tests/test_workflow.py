"""Staged-estimation workflow (varanneal_tpu/workflow.py): the round-3
campaign recipe as a library API. CPU-sized e2e: prior-box draws ->
own-draw anchors -> f32 screening ladder (+ snapshot) -> action ranking
-> strip anchors -> batch-split f64 polish, all through ONE call
(workflow.estimate), plus stage-level invariants (batch splitting is
pure re-batching; checkpoints use the campaign-compatible names)."""

import numpy as np
import pytest

import jax.numpy as jnp

from varanneal_tpu import workflow
from varanneal_tpu.models import nakl, NAKL_P_TRUE, nakl_param_boxes
from varanneal_tpu.twin import nakl_twin
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.api import build_bounds

STATE_BOUNDS = [(-150., 70.), (0., 1.), (0., 1.), (0., 1.)]
PIDX = [1, 3, 5]          # gNa, gK, gL


def _problem(N=61):
    tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=5)
    pbounds, _ = nakl_param_boxes(PIDX)
    bounds = STATE_BOUNDS + pbounds

    def make_problem(dtype):
        spec = build_spec(nakl, 4, tw["V"].astype(dtype), tw["t"], [0],
                          1.0, disc="SimpsonHermite",
                          P=np.asarray(NAKL_P_TRUE), pidx=PIDX,
                          stim=tw["stim"])
        action, parts = make_action(spec)
        lo, hi = build_bounds(spec, bounds, dtype)
        return action, parts, lo, hi

    # spec for shapes
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=PIDX,
                      stim=tw["stim"])
    return tw, spec, make_problem, pbounds


def _draw_ensemble(spec, tw, pbounds, B, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    N_f = spec.N_f
    V_f = np.interp(np.arange(N_f) / 2.0, np.arange(tw["V"].shape[0]),
                    tw["V"][:, 0])

    def a_inf(va, dva):
        return 0.5 * (1.0 + np.tanh((V_f - va) / dva))

    gss = [a_inf(NAKL_P_TRUE[7], NAKL_P_TRUE[8]),
           a_inf(NAKL_P_TRUE[11], NAKL_P_TRUE[12]),
           a_inf(NAKL_P_TRUE[15], NAKL_P_TRUE[16])]
    xps = []
    for _ in range(B):
        pe = [rng.uniform(*b) for b in pbounds]
        gates = [np.clip(g + rng.normal(0, 0.05, N_f), 0, 1)
                 for g in gss]
        xps.append(np.concatenate(
            [np.column_stack([V_f] + gates).ravel(), pe]).astype(dtype))
    return np.stack(xps)


def test_estimate_e2e(tmp_path):
    """One-call staged estimate, anchored, snapshot-seeded f64 polish
    with batch splitting; the winner's conductances land near truth."""
    tw, spec, make_problem, pbounds = _problem()
    B, n_beta, npar = 3, 8, len(PIDX)
    xp0 = _draw_ensemble(spec, tw, pbounds, B)
    rf0 = np.broadcast_to(
        1e-5 * np.array([1.0, 1e3, 1e3, 1e3]),
        (spec.N_f - 1, 4)).astype(np.float32)
    res = workflow.estimate(
        make_problem, xp0, np.arange(n_beta, dtype=np.float32),
        jnp.asarray(rf0), 2.0, n_params=npar,
        opts=LBFGSOptions(maxiter=60, m=5, pgtol=1e-4, ftol=1e-6),
        anchor_weight=10.0, anchor_width=0.25,
        snapshot_beta=n_beta - 2, polish_top=2, polish_batch=1,
        polish_opts=LBFGSOptions(maxiter=200, pgtol=1e-8, ftol=1e-12),
        polish_extra_betas=3,
        checkpoint_stem=str(tmp_path / "wf"), verbose=False)
    r1 = res.phase1
    assert r1.anchored
    assert r1.A.shape == (B, n_beta)
    # anchored phase-1 state carries npar extra center coords
    assert r1.XP.shape[1] == spec.n_state + 2 * npar
    assert r1.snapshot is not None
    assert res.polish is not None
    assert res.polish.XP.shape == (2, spec.n_state + npar)
    assert np.isfinite(res.best_A)
    # polished actions beat (or match) the f32 final-state actions
    assert res.best_A < np.sort(r1.A[:, -1])[0] * 1.5
    # the final estimate vector is anchor-free
    assert res.best.shape == (spec.n_state + npar,)
    # campaign-compatible checkpoint names were written
    assert (tmp_path / "wf_p1_ckpt.npz").exists()
    assert (tmp_path / "wf_pol_ckpt.npz").exists()
    assert (tmp_path / "wf_pol1_ckpt.npz").exists()   # batch split at 1
    # estimates stay inside their prior boxes (feasibility through both
    # stages); scientific recovery needs the full-depth config and is
    # measured in the PARITY campaigns, not this 8-rung toy
    p_est = res.best[-npar:]
    for v, b in zip(p_est, pbounds):
        assert b[0] - 1e-9 <= v <= b[1] + 1e-9
    # the f64 polish at the final phase-1 rung at least matches the f32
    # ladder's action there (same rung, deeper+cleaner solves): compare
    # polish column for rung n_beta-1 against phase-1's final column
    snap = n_beta - 2
    col = (n_beta - 1) - snap          # polish betas run snap..n_beta+2
    f32_A = res.phase1.A[res.polish.picks, -1]
    assert np.all(res.polish.A[:, col] <= f32_A * 1.1 + 1e-6)


def test_polish_batch_split_pure_rebatching():
    """batch=1 and batch=0 (single dispatch) give equivalent results —
    splitting is a worker-stability knob, not a numerics knob. (Not
    bitwise: vmap at B=1 vs B=3 compiles different reduction orders,
    and 40 curvature-driven iterations amplify the reorder roundoff —
    the contract is converged-quality equality.)"""
    tw, spec, make_problem, pbounds = _problem(N=41)
    npar = len(PIDX)
    xp0 = _draw_ensemble(spec, tw, pbounds, 3, seed=2, dtype=np.float64)
    rf0 = np.broadcast_to(
        1e-4 * np.array([1.0, 1e3, 1e3, 1e3]),
        (spec.N_f - 1, 4)).astype(np.float64)
    action, parts, lo, hi = make_problem(np.float64)
    betas = np.arange(4, dtype=np.float64)
    opts = LBFGSOptions(maxiter=40, pgtol=1e-8, ftol=1e-12)

    def run(batch):
        return workflow.polish(action, parts, xp0, betas,
                               jnp.asarray(rf0), 2.0, lower=lo, upper=hi,
                               opts=opts, batch=batch)

    r1, r0 = run(1), run(0)
    # actions and parameter estimates agree; the FREE gate paths are
    # weakly determined at low rf (sloppy directions) and drift a few
    # percent between reduction orders — not asserted
    np.testing.assert_allclose(r1.A, r0.A, rtol=2e-2)
    npar = len(PIDX)
    np.testing.assert_allclose(r1.XP[:, -npar:], r0.XP[:, -npar:],
                               rtol=5e-2)
    np.testing.assert_array_equal(r1.picks, np.arange(3))
    assert r1.XP.shape == r0.XP.shape


def test_safe_polish_batch_cpu():
    """No split limit off-TPU (the measured B=6 crash is a TPU-worker
    property); polish() treats 0 as 'one batch'."""
    assert workflow.safe_polish_batch() == 0


def test_estimate_polish_betas_use_ladder_values(monkeypatch):
    """Round-4 review fix: the polish ladder continues in BETA-VALUE
    space — with betas != arange(n_beta) the polish must resume at
    betas[snapshot_beta] and extrapolate the extra rungs at the
    ladder's spacing (not restart at the raw rung index, which
    de-anneals the snapshot by the offset)."""
    tw, spec, make_problem, pbounds = _problem(N=41)
    xp0 = _draw_ensemble(spec, tw, pbounds, 2, seed=1)
    betas = np.arange(10.0, 16.0, dtype=np.float32)     # rungs 10..15
    rf0 = np.broadcast_to(
        1e-9 * np.array([1.0, 1e3, 1e3, 1e3]),
        (spec.N_f - 1, 4)).astype(np.float32)
    captured = {}
    real_polish = workflow.polish

    def spy(action, parts, src, pol_betas, *a, **kw):
        captured["betas"] = np.asarray(pol_betas)
        return real_polish(action, parts, src, pol_betas, *a, **kw)

    monkeypatch.setattr(workflow, "polish", spy)
    workflow.estimate(
        make_problem, xp0, betas, jnp.asarray(rf0), 2.0, n_params=3,
        opts=LBFGSOptions(maxiter=10, m=4),
        snapshot_beta=4, polish_top=1, polish_extra_betas=2,
        polish_opts=LBFGSOptions(maxiter=10))
    # snapshot taken after rung index 4 -> polish resumes at beta
    # VALUE betas[4]=14, runs 14, 15, then extrapolates 16, 17
    np.testing.assert_allclose(captured["betas"],
                               [14.0, 15.0, 16.0, 17.0])


def test_phase1_anchor_requires_nparams():
    tw, spec, make_problem, pbounds = _problem(N=41)
    action, parts, lo, hi = make_problem(np.float32)
    xp0 = _draw_ensemble(spec, tw, pbounds, 2)
    with pytest.raises(ValueError, match="n_params"):
        workflow.phase1(action, parts, xp0, np.arange(3, dtype=np.float32),
                        np.float32(1e-5), 2.0, lower=lo, upper=hi,
                        anchor_weight=1.0)


# ---------------------------------------------------------------------------
# round-5: fused-solver gate through the workflow (VERDICT r4 #3) and
# transient-fault retry in polish (VERDICT r4 #4)
# ---------------------------------------------------------------------------

from varanneal_tpu.twin import lorenz96_twin
from varanneal_tpu.models import lorenz96
from varanneal_tpu.kernels import solve_pallas


def _l96_screen(N=41, dtype=np.float32):
    tw = lorenz96_twin(D=20, N_data=N, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"].astype(dtype), tw["t"],
                      tw["Lidx"], tw["RM"], disc="trapezoid",
                      P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    return tw, spec, action, parts


def test_phase1_fused_gate_interpret(monkeypatch):
    """An unanchored small-shape screen with ``spec=`` passed picks the
    fused whole-solve kernel under solver='auto' (interpret mode stands
    in for the TPU backend) and its ladder records match the generic
    loop (VERDICT r4 #3 Done criteria)."""
    solve_pallas.set_interpret(True)
    try:
        from varanneal_tpu.parallel import random_ensemble_inits
        tw, spec, action, parts = _l96_screen()
        B, n_beta = 2, 4
        xp0 = np.asarray(random_ensemble_inits(spec, B, seed=3,
                                               dtype=np.float32))
        betas = np.arange(n_beta, dtype=np.float32)
        opts = LBFGSOptions(maxiter=25, m=5, pgtol=1e-4, ftol=1e-7,
                            direction="two_loop")
        calls = {"n": 0}
        real = solve_pallas.make_rung_solver

        def spy(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(solve_pallas, "make_rung_solver", spy)
        r_f = workflow.phase1(action, parts, xp0, betas,
                              np.float32(1e-4), 2.0, opts=opts,
                              spec=spec, solver="auto")
        assert calls["n"] == 1, "auto gate did not build the fused solver"
        r_g = workflow.phase1(action, parts, xp0, betas,
                              np.float32(1e-4), 2.0, opts=opts,
                              spec=spec, solver="generic")
        assert calls["n"] == 1
        np.testing.assert_allclose(r_f.A, r_g.A, rtol=5e-4)
        np.testing.assert_array_equal(r_f.order, r_g.order)
    finally:
        solve_pallas.set_interpret(False)


def test_phase1_anchored_pins_generic(monkeypatch):
    """anchor_weight > 0 must NOT serve the fused kernel (its in-kernel
    action cannot see the anchor penalty); solver='fused' warns."""
    solve_pallas.set_interpret(True)
    try:
        tw, spec, make_problem, pbounds = _problem(N=41)
        action, parts, lo, hi = make_problem(np.float32)
        xp0 = _draw_ensemble(spec, tw, pbounds, 2)
        calls = {"n": 0}
        monkeypatch.setattr(
            solve_pallas, "make_rung_solver",
            lambda *a, **k: calls.__setitem__("n", calls["n"] + 1))
        with pytest.warns(UserWarning, match="anchor"):
            workflow.phase1(action, parts, xp0,
                            np.arange(2, dtype=np.float32),
                            np.float32(1e-6), 2.0, lower=lo, upper=hi,
                            opts=LBFGSOptions(maxiter=5, m=4),
                            n_params=3, anchor_weight=1.0,
                            spec=spec, solver="fused")
        assert calls["n"] == 0
    finally:
        solve_pallas.set_interpret(False)


def test_polish_retry_transient_fault(monkeypatch, tmp_path):
    """A dispatch raising a transient runtime fault (the measured
    worker-crash surface) is retried with resume from the batch
    checkpoint; polish() completes (VERDICT r4 #4 Done criteria)."""
    XlaRuntimeError = type("XlaRuntimeError", (RuntimeError,), {})
    tw, spec, make_problem, pbounds = _problem(N=41)
    action, parts, lo, hi = make_problem(np.float64)
    xp0 = _draw_ensemble(spec, tw, pbounds, 2, seed=3, dtype=np.float64)
    rf0 = np.broadcast_to(
        1e-4 * np.array([1.0, 1e3, 1e3, 1e3]),
        (spec.N_f - 1, 4)).astype(np.float64)
    betas = np.arange(3, dtype=np.float64)
    calls = {"n": 0}
    real = workflow.run_ladder_checkpointed

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise XlaRuntimeError("UNAVAILABLE: TPU worker crashed")
        return real(*a, **kw)

    monkeypatch.setattr(workflow, "_dispatch", flaky)
    r = workflow.polish(action, parts, xp0, betas, jnp.asarray(rf0),
                        2.0, lower=lo, upper=hi,
                        opts=LBFGSOptions(maxiter=15, m=4), batch=0,
                        retries=2, retry_wait=0.0,
                        checkpoint_stem=str(tmp_path / "rt"))
    assert calls["n"] == 2
    assert r.A.shape == (2, 3)
    assert np.all(np.isfinite(r.A))


def test_polish_retry_programming_error_reraises(monkeypatch):
    """Non-transient faults re-raise immediately — retry is for the
    worker-crash surface, not for hiding bugs."""
    tw, spec, make_problem, pbounds = _problem(N=41)
    action, parts, lo, hi = make_problem(np.float64)
    xp0 = _draw_ensemble(spec, tw, pbounds, 2, seed=3, dtype=np.float64)
    calls = {"n": 0}

    def broken(*a, **kw):
        calls["n"] += 1
        raise ValueError("shape bug")

    monkeypatch.setattr(workflow, "_dispatch", broken)
    with pytest.raises(ValueError, match="shape bug"):
        workflow.polish(action, parts, xp0,
                        np.arange(2, dtype=np.float64),
                        np.float64(1e-4), 2.0, lower=lo, upper=hi,
                        retries=3, retry_wait=0.0)
    assert calls["n"] == 1


def test_is_transient_classification():
    XlaRuntimeError = type("XlaRuntimeError", (RuntimeError,), {})
    assert workflow._is_transient(XlaRuntimeError("UNAVAILABLE"))
    assert workflow._is_transient(XlaRuntimeError("anything"))
    assert workflow._is_transient(RuntimeError("socket closed"))
    assert not workflow._is_transient(ValueError("UNAVAILABLE"))
    assert not workflow._is_transient(RuntimeError("plain failure"))
    assert not workflow._is_transient(TypeError("bad arg"))


def test_estimate_five_tuple_make_problem():
    """make_problem may return (action, parts, lo, hi, spec) — the
    spec feeds the shared solver gate (None-spec legacy 4-tuples keep
    working, pinned by test_estimate_e2e)."""
    tw, spec, make_problem, pbounds = _problem(N=41)

    def make_problem5(dtype):
        return make_problem(dtype) + (spec,)

    xp0 = _draw_ensemble(spec, tw, pbounds, 2)
    rf0 = np.broadcast_to(
        1e-5 * np.array([1.0, 1e3, 1e3, 1e3]),
        (spec.N_f - 1, 4)).astype(np.float32)
    res = workflow.estimate(
        make_problem5, xp0, np.arange(3, dtype=np.float32),
        jnp.asarray(rf0), 2.0, n_params=3,
        opts=LBFGSOptions(maxiter=10, m=4), polish_top=0)
    assert np.isfinite(res.best_A)
    assert res.best.shape == (spec.n_state + 3,)
