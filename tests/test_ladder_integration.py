"""Integration contract (SURVEY.md §4 level 2): the full JAX annealing
ladder matches a SciPy-L-BFGS-B-driven oracle ladder on a Lorenz-96 twin
experiment — action values at mutually-converged β steps to ≤1e-8 relative
(the BASELINE.md parity target), plus parameter recovery."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action, pack
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from tests.oracle import scipy_ladder


def make_twin(D=5, N_data=21, dt=0.025, F_true=8.17, sigma=0.4,
              Lidx=(0, 1, 3), seed=9):
    rng = np.random.default_rng(seed)

    def f_np(x, F):
        return (np.roll(x, -1) - np.roll(x, 2)) * np.roll(x, 1) - x + F

    def rk4(x, F, n):
        out = [x.copy()]
        for _ in range(n):
            k1 = f_np(x, F)
            k2 = f_np(x + dt / 2 * k1, F)
            k3 = f_np(x + dt / 2 * k2, F)
            k4 = f_np(x + dt * k3, F)
            x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            out.append(x.copy())
        return np.asarray(out)

    x = rng.normal(size=D) + F_true
    x = rk4(x, F_true, 1000)[-1]
    traj = rk4(x, F_true, N_data - 1)
    Y = traj[:, list(Lidx)] + sigma * rng.normal(size=(N_data, len(Lidx)))
    t = dt * np.arange(N_data)
    return traj, Y, t, rng


def test_ladder_matches_scipy_oracle():
    D, N_data = 5, 21
    Lidx = (0, 1, 3)
    traj, Y, t, rng = make_twin(D=D, N_data=N_data, Lidx=Lidx)

    spec = build_spec(lorenz96, D, Y, t, Lidx, RM=1.0 / 0.4 ** 2,
                      disc="trapezoid", P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    vag = jax.jit(jax.value_and_grad(action))
    parts_j = jax.jit(parts)

    # init: observed components from data, unobserved mild noise around the
    # data mean — keeps every β step solvable to full tolerance
    X0 = np.full((N_data, D), Y.mean()) + 0.5 * rng.normal(size=(N_data, D))
    X0[:, list(Lidx)] = Y
    XP0 = np.asarray(pack(spec, jnp.asarray(X0)))

    betas = np.arange(15)
    alpha, rf0 = 1.9, 1e-3
    maxiter, pgtol = 20000, 1e-11
    ftol = np.finfo(float).eps

    orc = scipy_ladder(
        lambda z, rf: (lambda v: (float(v[0]), np.asarray(v[1])))(
            vag(jnp.asarray(z), jnp.asarray(rf))),
        XP0, betas, rf0, alpha, maxiter=maxiter, pgtol=pgtol, factr=1.0,
        parts_fn=lambda z, rf: [float(u) for u in parts_j(
            jnp.asarray(z), jnp.asarray(rf))])

    opts = LBFGSOptions(maxiter=maxiter, pgtol=pgtol, ftol=ftol)
    res = jax.jit(lambda x0, b: run_ladder(
        action, parts, x0, b, rf0, alpha, opts=opts))(
        jnp.asarray(XP0), jnp.asarray(betas, float))

    A_j = np.asarray(res.A)
    A_o = orc["A"]
    stat_j = np.asarray(res.status)
    both_conv = (stat_j <= 1) & (orc["exitflags"] == 0)
    # the config is chosen so (nearly) every step converges on both sides
    assert both_conv.mean() >= 0.8, (stat_j, orc["exitflags"])
    rel = np.abs(A_j - A_o) / np.abs(A_o)
    # β=0 is the most degenerate (data-dominated, flattest) step: at
    # pgtol=1e-11 the two optimizers' stopping points differ by up to a few
    # e-8 in action there; every constrained step must meet 1e-8
    assert rel[both_conv][1:].max() <= 1e-8, rel
    assert rel[0] <= 5e-8, rel

    # decomposition recorded: A = ME + FE
    np.testing.assert_allclose(A_j, np.asarray(res.ME) + np.asarray(res.FE),
                               rtol=1e-12)

    # state-path and parameter parity at the final (stiffest) β
    if both_conv[-1]:
        dx = np.abs(np.asarray(res.paths[-1]) - orc["paths"][-1])
        scale = np.abs(orc["paths"][-1]).max()
        assert dx.max() / scale <= 1e-6, dx.max()

    # parameter parity with the oracle (the actual contract) + loose
    # recovery sanity (N=21 is too short for tight identifiability)
    F_final = float(np.asarray(res.paths)[-1][spec.n_state])
    F_oracle = float(orc["paths"][-1][spec.n_state])
    assert abs(F_final - F_oracle) <= 1e-6 * max(1.0, abs(F_oracle))
    assert abs(F_final - 8.17) < 4.0, F_final


def test_ladder_warm_start_semantics():
    """The scan carry must warm-start each β from the previous minimizer:
    re-running a single β from XP0 must (generically) give a different,
    higher-β-action answer than the laddered warm start (annealing is the
    whole point — cold starts at high β find worse minima)."""
    D, N_data = 5, 21
    Lidx = (0, 1, 3)
    traj, Y, t, rng = make_twin(D=D, N_data=N_data, Lidx=Lidx, seed=17)
    spec = build_spec(lorenz96, D, Y, t, Lidx, RM=6.25,
                      disc="trapezoid", P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)

    X0 = rng.uniform(-8, 8, size=(N_data, D))
    X0[:, list(Lidx)] = Y
    XP0 = jnp.asarray(np.asarray(pack(spec, jnp.asarray(X0))))

    betas = jnp.arange(20.0)
    opts = LBFGSOptions(maxiter=800, pgtol=1e-9)
    run = jax.jit(lambda x0, b: run_ladder(
        action, parts, x0, b, 1e-4, 1.8, opts=opts))
    full = run(XP0, betas)
    # cold start directly at the last β
    cold = run(XP0, betas[-1:])
    # warm-started final action must be no worse (and typically better)
    assert float(full.A[-1]) <= float(cold.A[-1]) * (1 + 1e-9)


def test_annealer_facade_simpson_hermite_nakl_bounds():
    """Facade-level smoke on the NaKL config family: stimulus-driven,
    Hermite-Simpson, box bounds on gates — the BASELINE config-3 shape
    (tiny sizes for CI)."""
    import varanneal_tpu
    from varanneal_tpu.models import nakl, NAKL_P_TRUE

    rng = np.random.default_rng(1)
    N = 26
    dt = 0.02
    t = dt * np.arange(N)
    stim = 15.0 * np.sin(2 * np.pi * t / 0.4) ** 2

    # synthesize voltage-ish data by integrating NaKL with RK4
    from tests.oracle import nakl_np
    x = np.array([-65.0, 0.1, 0.6, 0.3])
    traj = [x.copy()]
    for i in range(N - 1):
        def g(xx, ti, Ii):
            return nakl_np(ti, xx[None, :], (np.asarray(NAKL_P_TRUE),
                                             np.array([[Ii]])))[0]
        k1 = g(x, t[i], stim[i])
        k2 = g(x + dt / 2 * k1, t[i], stim[i])
        k3 = g(x + dt / 2 * k2, t[i], stim[i])
        k4 = g(x + dt * k3, t[i], stim[i])
        x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        traj.append(x.copy())
    traj = np.asarray(traj)
    V_data = traj[:, 0:1] + 0.5 * rng.normal(size=(N, 1))

    ann = varanneal_tpu.Annealer()
    ann.set_model(nakl, 4)
    ann.set_data(V_data, stim=stim, t=t)
    X0 = np.column_stack([V_data[:, 0],
                          np.full(N, 0.5), np.full(N, 0.5), np.full(N, 0.5)])
    P0 = np.asarray(NAKL_P_TRUE)
    bounds = [(-150, 70), (0, 1), (0, 1), (0, 1),   # V, m, h, n
              (50, 200)]                             # gNa (estimated)
    ann.anneal(X0, P0, alpha=2.0, beta_array=np.arange(8), RM=4.0,
               RF0=1e-4, Lidx=[0], Pidx=[1], disc="SimpsonHermite",
               bounds=bounds, opt_args=dict(maxiter=300))
    assert np.all(np.isfinite(ann.A_array))
    # gates inside [0,1], gNa inside its box at every β
    Xs = ann.minpaths_X
    assert Xs[..., 1:].min() >= -1e-12 and Xs[..., 1:].max() <= 1 + 1e-12
    gna = ann.minpaths_P[:, 0]
    assert np.all((gna >= 50) & (gna <= 200))
    # ME grows from its (near-zero) soft-constraint value as FE hardens,
    # but must stay at data-fit scale
    assert ann.me_array[-1] < 1e-4
