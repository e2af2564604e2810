"""Fused kernels under a device mesh (round-4, VERDICT r3 #5): the
composition a real multi-chip ensemble sweep would run — ens-sharded
batch x whole-solve / whole-problem Pallas kernels — exercised on the
8-virtual-device CPU mesh in interpret mode, asserting value equality
with the unsharded path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from varanneal_tpu.twin import lorenz96_twin
from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import (ensemble_mesh, make_ensemble_ladder,
                                    shard_batch, random_ensemble_inits)
from varanneal_tpu.kernels import solve_pallas
from varanneal_tpu.kernels.fe_pallas import select_action


@pytest.fixture(autouse=True)
def _interp():
    solve_pallas.set_interpret(True)
    yield
    solve_pallas.set_interpret(False)


def _problem(disc="trapezoid"):
    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc=disc, P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    rf0 = np.float32(4e-6 * tw["RM"])
    return spec, action, parts, rf0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fused_solver_ens_mesh_matches_unsharded():
    """The whole-solve kernel rides the ens mesh: sharded-batch ladder
    records equal the unsharded vmap ladder's bit-for-bit."""
    spec, action, parts, rf0 = _problem()
    opts = LBFGSOptions(maxiter=60, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    betas = jnp.arange(6, dtype=jnp.float32)
    solver = solve_pallas.make_rung_solver(spec, opts)
    xp0 = random_ensemble_inits(spec, 8, seed=1, dtype=np.float32)

    mesh = ensemble_mesh(8)
    fn_mesh = make_ensemble_ladder(action, parts, betas, rf0, 1.5,
                                   opts=opts, mesh=mesh,
                                   rung_solver=solver)
    fn_plain = make_ensemble_ladder(action, parts, betas, rf0, 1.5,
                                    opts=opts, rung_solver=solver)
    r_mesh = fn_mesh(shard_batch(xp0, mesh))
    r_plain = fn_plain(jnp.asarray(xp0))
    np.testing.assert_array_equal(np.asarray(r_mesh.A),
                                  np.asarray(r_plain.A))
    np.testing.assert_array_equal(np.asarray(r_mesh.XP),
                                  np.asarray(r_plain.XP))
    np.testing.assert_array_equal(np.asarray(r_mesh.niter),
                                  np.asarray(r_plain.niter))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fused_solver_bounded_ens_mesh():
    """Round-4 bounded kernel under the mesh (the NaKL-campaign shape:
    bounded ensemble sweep)."""
    from varanneal_tpu.api import build_bounds
    spec, action, parts, rf0 = _problem()
    opts = LBFGSOptions(maxiter=60, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop", bounded_algo="projection")
    betas = jnp.arange(5, dtype=jnp.float32)
    lower, upper = build_bounds(
        spec, [(-12.0, 12.0)] * 20 + [(0.0, 10.0)], np.float32)
    solver = solve_pallas.make_rung_solver(spec, opts,
                                           lower=lower, upper=upper)
    xp0 = random_ensemble_inits(spec, 8, seed=2, dtype=np.float32)
    lo_j, hi_j = jnp.asarray(lower), jnp.asarray(upper)

    mesh = ensemble_mesh(8)
    fn_mesh = make_ensemble_ladder(action, parts, betas, rf0, 1.5,
                                   opts=opts, mesh=mesh, lower=lo_j,
                                   upper=hi_j, rung_solver=solver)
    fn_plain = make_ensemble_ladder(action, parts, betas, rf0, 1.5,
                                    opts=opts, lower=lo_j, upper=hi_j,
                                    rung_solver=solver)
    r_mesh = fn_mesh(shard_batch(xp0, mesh))
    r_plain = fn_plain(jnp.asarray(xp0))
    np.testing.assert_array_equal(np.asarray(r_mesh.A),
                                  np.asarray(r_plain.A))
    np.testing.assert_array_equal(np.asarray(r_mesh.XP),
                                  np.asarray(r_plain.XP))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ag_engine_ens_mesh_matches_unsharded():
    """The whole-problem action+grad kernel (engine='ag') under the ens
    mesh through the generic solver."""
    spec, _, _, rf0 = _problem()
    from varanneal_tpu.kernels import ag_pallas
    ag_pallas.set_interpret(True)
    try:
        act, parts = select_action(spec, rf0, engine="ag",
                                   dtype=np.float32)
        opts = LBFGSOptions(maxiter=40, m=5, pgtol=1e-4, ftol=1e-6,
                            direction="two_loop")
        betas = jnp.arange(5, dtype=jnp.float32)
        xp0 = random_ensemble_inits(spec, 8, seed=3, dtype=np.float32)
        mesh = ensemble_mesh(8)
        fn_mesh = make_ensemble_ladder(act, parts, betas, rf0, 1.5,
                                       opts=opts, mesh=mesh)
        fn_plain = make_ensemble_ladder(act, parts, betas, rf0, 1.5,
                                        opts=opts)
        r_mesh = fn_mesh(shard_batch(xp0, mesh))
        r_plain = fn_plain(jnp.asarray(xp0))
        np.testing.assert_array_equal(np.asarray(r_mesh.A),
                                      np.asarray(r_plain.A))
        np.testing.assert_array_equal(np.asarray(r_mesh.XP),
                                      np.asarray(r_plain.XP))
    finally:
        ag_pallas.set_interpret(False)
