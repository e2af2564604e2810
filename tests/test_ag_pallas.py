"""Whole-problem fused action+grad kernel (kernels/ag_pallas.py) must
match the XLA action (itself pinned by the NumPy oracle, the SciPy
golden ladders, and the C++ analytic gradients) in value and gradient,
for every supported rf/RM shape, with and without stimulus, unbatched
and vmapped. Draws are data-informed (physical magnitudes): on wild
unphysical states both f32 paths lose digits to cancellation
identically (measured vs an f64 reference), which says nothing about
the kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu.ops import build_spec
from varanneal_tpu.ops.action import make_action, pack
from varanneal_tpu.kernels import ag_pallas
from varanneal_tpu.kernels.ag_pallas import make_action_ag, ag_supported
from varanneal_tpu.twin import lorenz96_twin, nakl_twin
from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE


@pytest.fixture(autouse=True)
def _interpret():
    ag_pallas.set_interpret(True)
    yield
    ag_pallas.set_interpret(False)


def _l96_spec(disc="trapezoid", RM=None, N=81):
    tw = lorenz96_twin(D=20, N_data=N, n_obs=8)
    return build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"] if RM is None else RM, disc=disc,
                      P=np.array([4.0]), pidx=[0]), tw


def _z0(spec, tw, rng, B=None):
    """Data-informed decision draw(s): observed columns from data,
    unobserved near the attractor scale, parameters near truth."""
    def one():
        X = rng.normal(2.0, 2.0, (spec.N_f, spec.D))
        rows = np.arange(spec.N_data) * spec.obs_stride
        X[np.ix_(rows, np.asarray(spec.Lidx))] = tw["Y"] + rng.normal(
            0, 0.3, tw["Y"].shape)
        return np.asarray(pack(spec, X, np.array([4.0 + rng.normal()])),
                          np.float32)
    if B is None:
        return jnp.asarray(one())
    return jnp.asarray(np.stack([one() for _ in range(B)]))


def _check(spec, rf, z, rtol=2e-5):
    act_x, _ = make_action(spec)
    act_p, _ = make_action_ag(spec)
    vag_x = jax.value_and_grad(lambda u: act_x(u, rf))
    vag_p = jax.value_and_grad(lambda u: act_p(u, rf))
    if z.ndim == 2:
        vag_x, vag_p = jax.vmap(vag_x), jax.vmap(vag_p)
    (vx, gx), (vp, gp) = vag_x(z), vag_p(z)
    vx, gx, vp, gp = map(np.asarray, (vx, gx, vp, gp))
    np.testing.assert_allclose(vp, vx, rtol=rtol)
    scale = np.abs(gx).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(gp / scale, gx / scale, atol=rtol)


@pytest.mark.parametrize("disc", ["trapezoid", "euler", "forwardmap"])
def test_matches_xla_scalar_rf(disc):
    rng = np.random.default_rng(1)
    spec, tw = _l96_spec(disc)
    assert ag_supported(spec, jnp.float32(3.0))
    _check(spec, jnp.float32(3.0), _z0(spec, tw, rng))


def test_matches_xla_diag_rf_and_rm():
    rng = np.random.default_rng(2)
    spec, tw = _l96_spec()
    rf = jnp.asarray(rng.uniform(0.5, 2.0, (spec.N_f - 1, spec.D)),
                     jnp.float32)
    assert ag_supported(spec, rf)
    _check(spec, rf, _z0(spec, tw, rng))
    RM2 = rng.uniform(0.5, 2.0, (spec.N_data, spec.L))
    spec2, _ = _l96_spec(RM=RM2)
    _check(spec2, jnp.float32(1.3), _z0(spec2, tw, rng))


def test_matches_xla_vmapped():
    rng = np.random.default_rng(3)
    spec, tw = _l96_spec()
    _check(spec, jnp.float32(2.0), _z0(spec, tw, rng, B=3))
    rf = jnp.asarray(rng.uniform(0.5, 2.0, (spec.N_f - 1, spec.D)),
                     jnp.float32)
    _check(spec, rf, _z0(spec, tw, rng, B=3))


def test_matches_xla_nakl_stimulus():
    rng = np.random.default_rng(4)
    tw = nakl_twin(N=301)
    spec = build_spec(nakl, 4, tw["V"], tw["t"], [0], 1.0,
                      disc="trapezoid", P=NAKL_P_TRUE,
                      pidx=list(range(len(NAKL_P_TRUE))),
                      stim=tw["stim"])
    assert ag_supported(spec, jnp.float32(0.9))

    def draw(B=None):
        def one():
            X = np.zeros((spec.N_f, 4))
            X[:, 0] = tw["V"][:, 0] + rng.normal(0, 1.0, spec.N_f)
            X[:, 1:] = rng.uniform(0.05, 0.95, (spec.N_f, 3))
            P = np.asarray(NAKL_P_TRUE) * rng.uniform(0.8, 1.2,
                                                      len(NAKL_P_TRUE))
            return np.asarray(pack(spec, X, P), np.float32)
        if B is None:
            return jnp.asarray(one())
        return jnp.asarray(np.stack([one() for _ in range(B)]))

    _check(spec, jnp.float32(0.9), draw(), rtol=5e-5)
    _check(spec, jnp.float32(0.9), draw(B=2), rtol=5e-5)


@pytest.mark.parametrize("disc", ["trapezoid", "euler", "forwardmap"])
def test_transposed_matches_xla(disc):
    """The transposed-layout kernel (make_action_ag_t + the
    f.transposed model contract) must match the XLA action. Measured
    perf-negative in its candidate regimes (PARITY.md) — kept opt-in,
    pinned here for correctness."""
    from varanneal_tpu.kernels.ag_pallas import (make_action_ag_t,
                                                 agt_supported)
    rng = np.random.default_rng(7)
    spec, tw = _l96_spec(disc)
    assert agt_supported(spec, jnp.float32(3.0))
    act_x, _ = make_action(spec)
    act_t, _ = make_action_ag_t(spec)
    z = _z0(spec, tw, rng, B=2)
    vx, gx = jax.vmap(jax.value_and_grad(
        lambda u: act_x(u, jnp.float32(3.0))))(z)
    vt, gt = jax.vmap(jax.value_and_grad(
        lambda u: act_t(u, jnp.float32(3.0))))(z)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(vx), rtol=2e-5)
    scale = np.abs(np.asarray(gx)).max()
    np.testing.assert_allclose(np.asarray(gt) / scale,
                               np.asarray(gx) / scale, atol=2e-5)


def test_supported_predicate_negatives():
    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    tr = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"], tw["RM"],
                    disc="trapezoid", P=np.array([4.0]), pidx=[0])
    assert not ag_supported(tr, jnp.float32(1.0), dtype=np.float64)
    rf3 = jnp.ones((tr.N_f - 1, 20, 20), jnp.float32)    # matrix R
    assert not ag_supported(tr, rf3)


@pytest.mark.parametrize("rf_kind", ["scalar", "diag"])
def test_matches_xla_simpson_hermite(rf_kind):
    """The SH branch: one model evaluation over all grid rows + exact
    shift matmuls must reproduce the XLA interleaved-rf SH action."""
    rng = np.random.default_rng(8)
    spec, tw = _l96_spec("SimpsonHermite", N=61)
    rf = (jnp.float32(1.7) if rf_kind == "scalar"
          else jnp.asarray(rng.uniform(0.5, 2.0, (spec.N_f - 1, 20)),
                           jnp.float32))
    assert ag_supported(spec, rf)
    _check(spec, rf, _z0(spec, tw, rng))
    _check(spec, rf, _z0(spec, tw, rng, B=2))


def test_matches_xla_strided_observations():
    """dt_model finer than the data grid: obs_stride > 1 rides the
    host-side weight embedding."""
    rng = np.random.default_rng(9)
    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc="trapezoid", P=np.array([4.0]),
                      pidx=[0], dt_model=tw["dt"] / 2)
    assert spec.obs_stride == 2 and ag_supported(spec, jnp.float32(1.0))
    _check(spec, jnp.float32(1.0), _z0(spec, tw, rng))


def test_vmapped_ensemble_ladder():
    """Regression: the ag action inside a VMAPPED ensemble ladder — a
    vmapped lax.while_loop instantiates closure constants as batched
    and custom_vmap rejects batched jaxpr consts, so the observation
    constants must ride as explicit arguments (CLAUDE.md gotcha; same
    as the fe_pallas SH wrapper)."""
    from varanneal_tpu.parallel import make_ensemble_ladder
    from varanneal_tpu.opt import LBFGSOptions

    rng = np.random.default_rng(6)
    spec, tw = _l96_spec(N=41)
    act, parts = make_action_ag(spec)
    z = _z0(spec, tw, rng, B=2)
    betas = np.arange(4, dtype=np.float32)
    fn = make_ensemble_ladder(act, parts, betas, np.float32(1e-4), 1.5,
                              opts=LBFGSOptions(maxiter=30,
                                                direction="compact"))
    res = fn(z)
    A = np.asarray(res.A)
    assert A.shape == (2, 4) and np.all(np.isfinite(A))


def test_solver_end_to_end_ag_action():
    """The fused action drives a real mini-ladder to the same optimum
    as the XLA action (same rungs, same solver)."""
    from varanneal_tpu.anneal.ladder import run_ladder
    from varanneal_tpu.opt import LBFGSOptions

    rng = np.random.default_rng(5)
    spec, tw = _l96_spec(N=41)
    act_x, parts_x = make_action(spec)
    act_p, parts_p = make_action_ag(spec)
    z0 = _z0(spec, tw, rng)
    betas = np.arange(8, dtype=np.float32)
    opts = LBFGSOptions(maxiter=150, pgtol=1e-7, direction="compact")
    rx = run_ladder(act_x, parts_x, z0, betas, np.float32(1e-4), 1.5,
                    opts=opts)
    rp = run_ladder(act_p, parts_p, z0, betas, np.float32(1e-4), 1.5,
                    opts=opts)
    Ax, Ap = np.asarray(rx.A), np.asarray(rp.A)
    # two f32 optimizers on identical-to-roundoff objectives follow
    # slightly different iterate paths; assert matched LADDER QUALITY
    # (every rung within 10%, identical optimum at the end) rather than
    # per-iterate equality
    np.testing.assert_allclose(Ap, Ax, rtol=0.1)
    assert Ap[-1] <= Ax[-1] * 1.02


# ---------------------------------------------------------------------------
# round-5: in-kernel compensated-f32 (VERDICT r4 #5)
# ---------------------------------------------------------------------------

def test_comp_sum_block_exactness():
    """The in-kernel two-float reduction (shift/roll butterflies) must
    recover the f64-exact sum of adversarial f32 data to ~f32-ulp^2 —
    like ops.action.comp_sum, and far beyond a plain f32 sum."""
    from functools import partial
    from jax.experimental import pallas as pl
    rng = np.random.default_rng(0)
    for N, D in [(8, 128), (24, 128), (168, 256)]:
        # adversarial: large cancellation + tiny tail terms
        x = np.zeros((N, D), np.float32)
        x[:] = rng.normal(0, 1.0, (N, D))
        x[0, 0] = 3e7
        x[1, 0] = -3e7
        x[2] = 1e-4 * rng.normal(size=D)

        def kern(x_ref, o_ref):
            hi, lo = ag_pallas.comp_sum_block(x_ref[...])
            cc = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            o_ref[...] = ((cc == 0).astype(jnp.float32) * hi
                          + (cc == 1).astype(jnp.float32) * lo)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            interpret=True)(jnp.asarray(x))
        out = np.asarray(out)
        got = np.float64(out[0, 0]) + np.float64(out[0, 1])
        want = np.sum(x.astype(np.float64))
        plain = np.float64(np.sum(x, dtype=np.float32))
        assert abs(got - want) <= 1e-6 * max(1.0, abs(want)), (N, D)
        # and it genuinely beats the plain f32 sum on this data
        assert abs(got - want) < abs(plain - want) or plain == want


@pytest.mark.parametrize("case", ["trap_scalar", "sh_scalar",
                                  "sh_diag", "nakl_stim"])
def test_compensated_matches_xla_compensated(case):
    """make_action_ag(compensated=True) must reproduce the XLA
    compensated action's value (f64 scalar from an f32 decision path)
    and the plain gradient, across disc/rf/stimulus modes."""
    rng = np.random.default_rng(3)
    if case == "nakl_stim":
        tw = nakl_twin(N=61, dt=0.04, sigma=1.0, seed=5)
        spec = build_spec(nakl, 4, tw["V"].astype(np.float32),
                          tw["t"], [0], 1.0, disc="SimpsonHermite",
                          P=np.asarray(NAKL_P_TRUE), pidx=[1, 3, 5],
                          stim=tw["stim"])
        rf = np.ascontiguousarray(np.broadcast_to(
            1e3 * np.array([1.0, 1e3, 1e3, 1e3]),
            (spec.N_f - 1, 4))).astype(np.float32)
        V_f = np.interp(np.arange(spec.N_f) / 2.0, np.arange(61),
                        tw["V"][:, 0])
        gates = [np.clip(0.5 + rng.normal(0, 0.05, spec.N_f), 0, 1)
                 for _ in range(3)]
        z = jnp.asarray(np.concatenate(
            [np.column_stack([V_f] + gates).ravel(),
             [120.0, 30.0, 0.2]]).astype(np.float32))
    else:
        disc = "trapezoid" if case == "trap_scalar" else "SimpsonHermite"
        spec, tw = _l96_spec(disc=disc, N=41)
        z = _z0(spec, tw, rng)
        if case == "sh_diag":
            rf = (1e4 * (1.0 + 0.1 * rng.random(
                (spec.N_f - 1, spec.D)))).astype(np.float32)
        else:
            rf = np.float32(1e5)
    a_k, _ = make_action_ag(spec, compensated=True)
    a_x, _ = make_action(spec, compensated=True)
    vk = a_k(z, rf)
    vx = a_x(z, rf)
    assert vk.dtype == vx.dtype            # f64 contract under x64
    np.testing.assert_allclose(float(vk), float(vx), rtol=2e-6)
    gk = jax.grad(lambda u: a_k(u, rf))(z)
    gx = jax.grad(lambda u: a_x(u, rf))(z)
    assert gk.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=1e-3, atol=1e-5 * float(
                                   np.max(np.abs(np.asarray(gx)))))
    # vmapped path (the ladder context)
    vkv = jax.vmap(a_k, in_axes=(0, None))(jnp.stack([z, z]), rf)
    np.testing.assert_allclose(np.asarray(vkv), float(vx), rtol=2e-6)


def test_compensated_accuracy_beats_plain_f32():
    """At high rf the compensated kernel action must stay closer to the
    f64 reference than the plain f32 kernel — the round-2/3 measured
    failure mode (f32 saturation of the final action) closed on-chip."""
    spec, tw = _l96_spec(disc="trapezoid", N=81)
    rng = np.random.default_rng(11)
    z = _z0(spec, tw, rng)
    rf = np.float32(4e6)
    a_p, _ = make_action_ag(spec)
    a_c, _ = make_action_ag(spec, compensated=True)
    spec64 = build_spec(lorenz96, 20,
                        tw["Y"].astype(np.float64), tw["t"],
                        tw["Lidx"], tw["RM"], disc="trapezoid",
                        P=np.array([4.0]), pidx=[0])
    a_64, _ = make_action(spec64)
    ref = float(a_64(jnp.asarray(np.asarray(z), np.float64),
                     np.float64(rf)))
    err_plain = abs(float(a_p(z, rf)) - ref)
    err_comp = abs(float(a_c(z, rf)) - ref)
    assert err_comp <= err_plain
    assert err_comp <= 1e-5 * abs(ref)


def test_facade_compensated_ag_engine():
    """engine='ag' + compensated=True through the facade: the ladder
    runs on the compensated kernel and matches the compensated-XLA
    ladder's records."""
    from varanneal_tpu.api import Annealer
    tw = lorenz96_twin(D=20, N_data=21, n_obs=8)
    rng = np.random.default_rng(4)
    X0 = rng.normal(2.0, 2.0, (21, 20))

    def run(engine):
        ann = Annealer()
        ann.set_model(lorenz96, 20)
        ann.set_data(tw["Y"].astype(np.float32), t=tw["t"])
        ann.anneal(X0, np.array([4.0]), 1.7, np.arange(5),
                   tw["RM"], 1e-4, tw["Lidx"], [0],
                   opt_args=dict(maxiter=20), compensated=True,
                   dtype=np.float32, engine=engine)
        return ann
    a_ag = run("ag")
    a_x = run("auto")
    np.testing.assert_allclose(a_ag.A_array, a_x.A_array, rtol=1e-4)
    assert np.all(np.isfinite(a_ag.A_array))
