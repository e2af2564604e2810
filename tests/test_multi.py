"""Multi-experiment joint action: packing, parity with the single-
experiment action, bounds replication, and a joint mini-ladder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from varanneal_tpu.models import nakl, NAKL_P_TRUE, lorenz96
from varanneal_tpu.twin import nakl_twin
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.ops.multi import (make_multi_action, multi_pack,
                                     multi_unpack, build_multi_bounds)


def _nakl_specs(K=2, N=21, disc="SimpsonHermite"):
    specs = []
    for k in range(K):
        tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=11 + k, seg=7)
        specs.append(build_spec(nakl, 4, tw["V"], tw["t"], [0], 1.0,
                                disc=disc, P=np.asarray(NAKL_P_TRUE),
                                pidx=[1, 2, 3, 4, 5], stim=tw["stim"]))
    return specs


@pytest.mark.parametrize("disc", ["trapezoid", "SimpsonHermite"])
def test_multi_action_is_mean_of_singles(disc):
    specs = _nakl_specs(K=3, disc=disc)
    act_m, parts_m = make_multi_action(specs)
    rng = np.random.default_rng(0)
    Xs = [rng.normal(size=(s.N_f, s.D)) for s in specs]
    pest = np.asarray([110.0, 45.0, 22.0, -70.0, 0.4])
    XP = multi_pack(specs, Xs, P=None)
    XP = XP.at[3 * specs[0].n_state:].set(jnp.asarray(pest))
    rf = 2e-3
    A_m, me_m, fe_m = parts_m(XP, rf)
    singles = []
    for s, X in zip(specs, Xs):
        a, p = make_action(s)
        xp1 = jnp.concatenate([jnp.reshape(jnp.asarray(X), (-1,)),
                               jnp.asarray(pest)])
        singles.append([float(v) for v in p(xp1, rf)])
    singles = np.asarray(singles)
    np.testing.assert_allclose(float(A_m), singles[:, 0].mean(), rtol=1e-12)
    np.testing.assert_allclose(float(me_m), singles[:, 1].mean(), rtol=1e-12)
    np.testing.assert_allclose(float(fe_m), singles[:, 2].mean(), rtol=1e-12)
    # gradient splits into per-experiment state blocks + summed param part
    # (grads under jit: jaxlib 0.9.0's CPU eager slice-transpose corrupts
    # the heap on this model — same bug noted in test_pallas.py)
    g = jax.jit(jax.grad(act_m))(XP, rf)
    n = specs[0].n_state
    for k, (s, X) in enumerate(zip(specs, Xs)):
        a, _ = make_action(s)
        xp1 = jnp.concatenate([jnp.reshape(jnp.asarray(X), (-1,)),
                               jnp.asarray(pest)])
        g1 = jax.jit(jax.grad(a))(xp1, rf)
        np.testing.assert_allclose(np.asarray(g[k * n: (k + 1) * n]),
                                   np.asarray(g1[:n]) / 3.0, rtol=1e-10,
                                   atol=1e-14)


def test_multi_unpack_roundtrip():
    specs = _nakl_specs(K=2)
    rng = np.random.default_rng(1)
    Xs = [rng.normal(size=(s.N_f, s.D)) for s in specs]
    XP = multi_pack(specs, Xs)
    Xs2, pest = multi_unpack(specs, XP)
    for X, X2 in zip(Xs, Xs2):
        np.testing.assert_allclose(np.asarray(X2), X)
    assert pest.shape == (5,)


def test_multi_bounds_replication():
    specs = _nakl_specs(K=2)
    bounds = ([(-150., 70.), (0., 1.), (0., 1.), (0., 1.)]
              + [(50., 200.), (20., 80.), (5., 60.), (-100., -50.),
                 (0.05, 1.0)])
    lo, hi = build_multi_bounds(specs, bounds, np.float64)
    n = specs[0].n_state
    assert lo.shape == (2 * n + 5,)
    np.testing.assert_array_equal(lo[:n], lo[n: 2 * n])
    assert lo[0] == -150. and hi[2 * n] == 200.


def test_multi_spec_validation():
    specs = _nakl_specs(K=2)
    bad = _nakl_specs(K=1, N=23)[0]
    with pytest.raises(ValueError):
        make_multi_action([specs[0], bad])
    rng = np.random.default_rng(0)
    t = 0.025 * np.arange(21)
    l96 = build_spec(lorenz96, 6, rng.normal(size=(21, 3)), t, [0, 2, 4],
                     4.0, disc="trapezoid", P=np.full((21, 1), 8.0),
                     pidx=[0])
    with pytest.raises(ValueError):
        make_multi_action([l96])          # time-dependent params


def test_multi_ladder_runs():
    """Joint 2-protocol mini-ladder executes under jit + bounds."""
    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.opt import LBFGSOptions
    specs = _nakl_specs(K=2, N=15)
    act, parts = make_multi_action(specs)
    bounds = ([(-150., 70.), (0., 1.), (0., 1.), (0., 1.)]
              + [(50., 200.), (20., 80.), (5., 60.), (-100., -50.),
                 (0.05, 1.0)])
    lo, hi = build_multi_bounds(specs, bounds, np.float64)
    rng = np.random.default_rng(2)
    Xs = [np.column_stack([tw_V, *[np.clip(rng.uniform(0, 1, s.N_f), 0, 1)
                                   for _ in range(3)]])
          for s, tw_V in ((s, np.interp(np.arange(s.N_f) / 2.0,
                                        np.arange(s.N_data),
                                        np.asarray(s.Y)[:, 0]))
                          for s in specs)]
    XP0 = multi_pack(specs, Xs)
    opts = LBFGSOptions(maxiter=25, pgtol=1e-8)
    res = jax.jit(lambda z, b: run_ladder(
        act, parts, z, b, 1e-4, 1.6, lower=lo, upper=hi, opts=opts,
        store_paths=False))(XP0, jnp.arange(4.0))
    assert np.all(np.isfinite(np.asarray(res.A)))
    assert np.asarray(res.A)[-1] >= 0.0
