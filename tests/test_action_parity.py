"""Action/gradient parity: JAX implementation vs the independent NumPy
oracle, at random points, over every disc × R-shape × parameter-mode combo
(SURVEY.md §4 test contract, unit level)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE
from varanneal_tpu.ops import build_spec, make_action, pack
from tests.oracle import OracleProblem, lorenz96_np, nakl_np

DISCS = ["euler", "trapezoid", "SimpsonHermite", "forwardmap"]


def _l96_problem(rng, disc, rm_kind="scalar", rf_kind="scalar",
                 time_dep=False, dt_model=None, D=6, N_data=13, L=3):
    Lidx = sorted(rng.choice(D, size=L, replace=False).tolist())
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, L))

    def mk_R(kind, N, K):
        if kind == "scalar":
            return 4.0
        if kind == "diag":
            return rng.uniform(0.5, 2.0, size=(N, K))
        m = rng.normal(size=(N, K, K))
        return np.einsum("nij,nkj->nik", m, m) + 3 * np.eye(K)  # SPD

    RM = mk_R(rm_kind, N_data, L)

    nskip = 1 if dt_model is None else int(round(t[1] / dt_model))
    N_base = (N_data - 1) * nskip + 1
    N_f = 2 * N_base - 1 if disc == "SimpsonHermite" else N_base
    RF = mk_R(rf_kind, N_f - 1, D)

    if time_dep:
        P = rng.uniform(7.0, 9.0, size=(N_f, 1))
    else:
        P = np.array([8.17])

    kw = dict(disc=disc, P=P, pidx=[0], dt_model=dt_model)
    spec = build_spec(lorenz96, D, Y, t, Lidx, RM, **kw)
    orc = OracleProblem(lorenz96_np, D, Y, t, Lidx, RM, **kw)
    assert spec.n_dof == orc.n_dof
    assert spec.N_f == orc.N_f
    XP = rng.normal(size=spec.n_dof)
    return spec, orc, XP, RF


@pytest.mark.parametrize("disc", DISCS)
@pytest.mark.parametrize("rm_kind,rf_kind", [
    ("scalar", "scalar"), ("diag", "diag"), ("mat", "mat"),
    ("scalar", "diag"), ("mat", "scalar"),
])
def test_action_value_parity(disc, rm_kind, rf_kind):
    rng = np.random.default_rng(hash((disc, rm_kind, rf_kind)) % 2**32)
    spec, orc, XP, RF = _l96_problem(rng, disc, rm_kind, rf_kind)
    action, parts = make_action(spec)
    A_j, me_j, fe_j = [float(v) for v in parts(jnp.asarray(XP), jnp.asarray(RF))]
    A_o, me_o, fe_o = orc.action(XP, RF)
    assert A_j == pytest.approx(A_o, rel=1e-12)
    assert me_j == pytest.approx(me_o, rel=1e-12)
    assert fe_j == pytest.approx(fe_o, rel=1e-12)


@pytest.mark.parametrize("disc", DISCS)
@pytest.mark.parametrize("time_dep", [False, True])
def test_action_parity_time_dep_params(disc, time_dep):
    rng = np.random.default_rng(7)
    spec, orc, XP, RF = _l96_problem(rng, disc, "diag", "diag",
                                     time_dep=time_dep)
    _, parts = make_action(spec)
    A_j = float(parts(jnp.asarray(XP), jnp.asarray(RF))[0])
    A_o = orc.action(XP, RF)[0]
    assert A_j == pytest.approx(A_o, rel=1e-12)


@pytest.mark.parametrize("disc", ["trapezoid", "SimpsonHermite"])
def test_action_parity_dt_model_nskip(disc):
    """Finer model grid than data grid (dt_model mechanics)."""
    rng = np.random.default_rng(11)
    spec, orc, XP, RF = _l96_problem(rng, disc, dt_model=0.025 / 5)
    _, parts = make_action(spec)
    A_j = float(parts(jnp.asarray(XP), jnp.asarray(RF))[0])
    A_o = orc.action(XP, RF)[0]
    assert A_j == pytest.approx(A_o, rel=1e-12)


@pytest.mark.parametrize("disc", DISCS)
def test_gradient_vs_fd(disc):
    """jax.grad vs central differences of the ORACLE action (independent
    gradient check; eps tuned for f64 central differences)."""
    rng = np.random.default_rng(3)
    spec, orc, XP, RF = _l96_problem(rng, disc)
    action, _ = make_action(spec)
    g = np.asarray(jax.grad(action)(jnp.asarray(XP), jnp.asarray(RF)))
    dirs = rng.normal(size=(6, spec.n_dof))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    fd = orc.grad_fd(XP, RF, dirs, eps=1e-6)
    np.testing.assert_allclose(dirs @ g, fd, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("disc", ["euler", "trapezoid", "SimpsonHermite"])
def test_residuals_vanish_on_exact_polynomial(disc):
    """Property test (SURVEY.md §4): the discretization residual vanishes on
    trajectories the scheme integrates exactly.

    Use linear dynamics f(t,x,p) = c (constant vector field): the exact
    trajectory x(t) = x0 + c t is integrated exactly by Euler, trapezoid and
    Simpson/Hermite alike.
    """
    D, N = 4, 9
    c = np.arange(1.0, D + 1.0)

    def f_const(t, x, p):
        return jnp.broadcast_to(jnp.asarray(c), x.shape)

    t = 0.1 * np.arange(N)
    Y = np.zeros((N, 2))
    spec = build_spec(f_const, D, Y, t, [0, 1], 1.0, disc=disc)
    X = spec.t_f[:, None] * c[None, :] + 0.5
    from varanneal_tpu.ops import model_residuals
    res = model_residuals(spec, jnp.asarray(X), jnp.zeros((0,)))
    if disc == "SimpsonHermite":
        for r in res:
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    else:
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)


def test_nakl_model_parity_and_stim():
    """NaKL with stimulus: JAX vs oracle action parity (driven system,
    f(t, x, (p, stim)) convention)."""
    rng = np.random.default_rng(5)
    D, N_data = 4, 11
    t = 0.02 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 1)) * 20 - 60
    stim = rng.normal(size=(N_data,)) * 5
    P = np.asarray(NAKL_P_TRUE)
    kw = dict(disc="trapezoid", P=P, pidx=[1, 3, 5], stim=stim)
    spec = build_spec(nakl, D, Y, t, [0], 4.0, **kw)
    orc = OracleProblem(nakl_np, D, Y, t, [0], 4.0, **kw)
    XP = rng.normal(size=spec.n_dof)
    # keep gates in a sane range so tanh args match well
    XP[: spec.n_state] = rng.uniform(-1, 1, size=spec.n_state)
    _, parts = make_action(spec)
    A_j = float(parts(jnp.asarray(XP), 1e-3)[0])
    A_o = orc.action(XP, 1e-3)[0]
    assert A_j == pytest.approx(A_o, rel=1e-12)


def test_compensated_action_parity_and_accuracy():
    """compensated=True must agree with the plain action in f64 (the sum
    is already exact there to ~ulp) and must be at least as close to the
    f64 truth as the plain f32 sum on a large reduction."""
    import jax
    import jax.numpy as jnp
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.ops.action import comp_sum
    import math
    rng = np.random.default_rng(0)
    D, N_data = 20, 201
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 8))
    spec = build_spec(lorenz96, D, Y, t, list(range(8)), 4.0,
                      disc="trapezoid", P=np.array([8.17]), pidx=[0])
    a_plain, _ = make_action(spec)
    a_comp, _ = make_action(spec, compensated=True)
    xp64 = jnp.asarray(rng.normal(size=spec.n_dof))
    rf = 3.7e2
    A64p = float(a_plain(xp64, rf))
    A64c = float(a_comp(xp64, rf))
    assert abs(A64c - A64p) / abs(A64p) < 1e-14
    # f32 decision path: the compensated action returns an f64 SCALAR
    # (vector math stays f32) and must beat the one-f32-ulp floor of the
    # plain sum by >=10x against the f64-on-same-f32-inputs reference
    xp32 = xp64.astype(jnp.float32)
    A32p = float(jax.jit(a_plain)(xp32, jnp.float32(rf)))
    out_c = jax.jit(a_comp)(xp32, jnp.float32(rf))
    assert out_c.dtype == jnp.float64
    A32c = float(out_c)
    Aref = float(a_plain(xp32.astype(jnp.float64), float(rf)))
    assert abs(A32c - Aref) * 10 <= abs(A32p - Aref)
    # comp_sum is exact to output rounding on an adversarial vector
    x = np.concatenate([rng.normal(size=4096) * 1e4,
                        rng.normal(size=4096) * 1e-4]).astype(np.float32)
    exact = math.fsum(x.astype(np.float64))
    got = float(jax.jit(comp_sum)(jnp.asarray(x)))
    assert abs(got - exact) <= 4 * abs(exact) * np.finfo(np.float32).eps


def test_compensated_f32_ladder_dtypes():
    """A compensated-f32 objective returns f64 scalars while the decision
    vector stays f32: the solvers must keep x/g in f32 (no silent
    emulated-f64 model evaluation) and carry f-values in f64. Regression
    for the while-carry dtype mismatch."""
    import jax
    import jax.numpy as jnp
    from varanneal_tpu.models import nakl, NAKL_P_TRUE
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.api import build_bounds
    from varanneal_tpu.anneal import run_ladder
    tw = nakl_twin(N=21, dt=0.04, sigma=1.0, seed=7, seg=6)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 2, 3, 4, 5],
                      stim=tw["stim"])
    a, p = make_action(spec, compensated=True)
    lo, hi = build_bounds(
        spec, [(-150., 70.), (0., 1.), (0., 1.), (0., 1.),
               (50., 200.), (20., 80.), (5., 60.), (-100., -50.),
               (0.05, 1.0)], np.float32)
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(spec.n_dof,)).astype(np.float32))
    for algo in ("subspace", "projection"):
        opts = LBFGSOptions(maxiter=10, pgtol=1e-4, ftol=1e-7,
                            bounded_algo=algo)
        r = jax.jit(lambda z: run_ladder(
            a, p, z, jnp.arange(2.0, dtype=jnp.float32),
            jnp.float32(1e-3), 1.6, lower=lo, upper=hi, opts=opts,
            store_paths=False))(xp)
        assert np.asarray(r.XP).dtype == np.float32
        assert np.asarray(r.A).dtype == np.float64
        assert np.all(np.isfinite(np.asarray(r.A)))


def test_facade_compensated_kwarg():
    import jax.numpy as jnp
    from varanneal_tpu.api import Annealer
    from varanneal_tpu.models import lorenz96
    rng = np.random.default_rng(2)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    ann = Annealer()
    ann.set_model(lorenz96, D)
    ann.set_data(Y, t=t)
    X0 = rng.normal(size=(N_data, D))
    ann.anneal(X0, np.array([8.0]), 1.7, np.arange(4), 4.0, 1e-4,
               [0, 2, 4], [0], opt_args=dict(maxiter=10),
               compensated=True)
    assert np.all(np.isfinite(ann.A_array))
    import pytest
    with pytest.raises(ValueError):
        ann.anneal(X0, np.array([8.0]), 1.7, np.arange(4), 4.0, 1e-4,
                   [0, 2, 4], [0], opt_args=dict(maxiter=10),
                   compensated=True, engine="pallas")
