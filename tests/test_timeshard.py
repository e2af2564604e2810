"""Time-axis sharding tests on the forced 8-device CPU mesh: the
time-sharded structured ladder (with exact-semantics grid padding) must
match the unsharded flat ladder for both 1-step (trapezoid) and 2-step
(Hermite–Simpson) stencils, and compose with ensemble sharding on a 2-D
mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.ops.action import (
    make_action_tree, tree_of_flat, flat_of_tree)
from varanneal_tpu.ops.spec import pad_spec_time, pad_rf0, \
    pad_decision_tree, canonical_R
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import (
    time_mesh, make_timesharded_ladder, random_ensemble_inits)


def _problem(disc="trapezoid", N_data=33, D=6, seed=0):
    rng = np.random.default_rng(seed)
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc=disc, P=np.array([8.0]), pidx=[0])
    return spec


def test_tree_flat_roundtrip():
    spec = _problem()
    rng = np.random.default_rng(1)
    XP = rng.normal(size=spec.n_dof)
    tree = tree_of_flat(spec, XP)
    assert tree["X"].shape == (spec.N_f, spec.D)
    np.testing.assert_array_equal(np.asarray(flat_of_tree(spec, tree)), XP)


def test_tree_action_matches_flat():
    spec = _problem(disc="SimpsonHermite")
    rng = np.random.default_rng(2)
    XP = jnp.asarray(rng.normal(size=spec.n_dof))
    _, parts_flat = make_action(spec)
    _, parts_tree = make_action_tree(spec)
    a1 = [float(v) for v in parts_flat(XP, 1e-3)]
    a2 = [float(v) for v in parts_tree(tree_of_flat(spec, XP), 1e-3)]
    np.testing.assert_allclose(a1, a2, rtol=1e-15)


def test_padded_action_exactness():
    """pad_spec_time + pad_rf0 must leave the action value EXACTLY
    invariant (the padding contract)."""
    for disc in ("trapezoid", "SimpsonHermite"):
        spec = _problem(disc=disc, seed=5)
        rng = np.random.default_rng(6)
        XP = rng.normal(size=spec.n_dof)
        rf0 = canonical_R(2.5e-4, spec.N_f - 1, spec.D, "RF0")
        spec_pad, scale = pad_spec_time(spec, 8)
        assert spec_pad.N_f % 8 == 0
        rf_pad = pad_rf0(spec, spec_pad, rf0, scale)
        _, parts = make_action(spec)
        _, parts_pad = make_action_tree(spec_pad)
        tree = pad_decision_tree(spec, spec_pad, tree_of_flat(spec, XP))
        a1 = [float(v) for v in parts(jnp.asarray(XP), 2.5e-4)]
        a2 = [float(v) for v in parts_pad(tree, jnp.asarray(rf_pad))]
        np.testing.assert_allclose(a1, a2, rtol=1e-13)


def _run_both(disc, n_time):
    spec = _problem(disc=disc)
    betas = jnp.arange(3.0)
    opts = LBFGSOptions(maxiter=20, pgtol=1e-9)
    xp0 = random_ensemble_inits(spec, 1, seed=3)[0]

    action, parts = make_action(spec)
    ref = jax.jit(lambda z: run_ladder(action, parts, z, betas, 1e-4, 1.7,
                                       opts=opts, store_paths=False))(
        jnp.asarray(xp0))

    mesh = time_mesh(n_time)
    prob = make_timesharded_ladder(spec, betas, 1e-4, 1.7, mesh=mesh,
                                   opts=opts, store_paths=False)
    res = prob.run(prob.prepare(xp0))
    return spec, prob, ref, res


def test_timeshard_trapezoid_matches_unsharded():
    spec, prob, ref, res = _run_both("trapezoid", 4)
    # reduction order differs under sharding; line-search branches amplify
    # ulps over the iteration path — same minima, not bitwise iterates
    np.testing.assert_allclose(np.asarray(res.A), np.asarray(ref.A),
                               rtol=1e-5)
    X = prob.unpad_X(res.XP["X"])
    np.testing.assert_allclose(
        X.ravel(), np.asarray(ref.XP)[: spec.n_state], rtol=1e-5, atol=1e-7)
    # X really is sharded over the time axis
    assert "time" in str(res.XP["X"].sharding.spec)


def test_timeshard_simpson_hermite_matches_unsharded():
    """2-step stencil: halo of two rows must be handled by GSPMD; SH grids
    are odd so padding is always exercised."""
    spec, prob, ref, res = _run_both("SimpsonHermite", 4)
    np.testing.assert_allclose(np.asarray(res.A), np.asarray(ref.A),
                               rtol=1e-5)


def test_2d_mesh_ens_by_time():
    """4 ensemble members x 2-way time sharding on an (ens=4, time=2)
    mesh."""
    spec = _problem()
    betas = jnp.arange(2.0)
    opts = LBFGSOptions(maxiter=15, pgtol=1e-9)
    B = 8
    xp0 = random_ensemble_inits(spec, B, seed=4)

    action, parts = make_action(spec)
    ref = jax.jit(jax.vmap(
        lambda z: run_ladder(action, parts, z, betas, 1e-4, 1.7,
                             opts=opts, store_paths=False)))(
        jnp.asarray(xp0))

    mesh = time_mesh(n_time=2, n_ens=4)
    prob = make_timesharded_ladder(spec, betas, 1e-4, 1.7, mesh=mesh,
                                   opts=opts, store_paths=False,
                                   batched=True)
    res = prob.run(prob.prepare(xp0))
    np.testing.assert_allclose(np.asarray(res.A), np.asarray(ref.A),
                               rtol=1e-8)
    assert len(res.A.sharding.device_set) >= 4
