"""Packed-member whole-solve kernel (kernels/solve_pack_pallas.py),
interpret mode: member-for-member parity with the k=1 whole-solve
kernel (same math, lockstep masking = vmap semantics) including
non-divisible batches (padding members dropped), plus the ladder
integration path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from varanneal_tpu.twin import lorenz96_twin, nakl_twin
from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.parallel import random_ensemble_inits
from varanneal_tpu.kernels import solve_pallas, solve_pack_pallas


@pytest.fixture(autouse=True)
def _interp():
    solve_pallas.set_interpret(True)
    solve_pack_pallas.set_interpret(True)
    yield
    solve_pallas.set_interpret(False)
    solve_pack_pallas.set_interpret(False)


def _l96_spec(N=41, disc="trapezoid"):
    tw = lorenz96_twin(D=20, N_data=N, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc=disc, P=np.array([4.0]), pidx=[0])
    return tw, spec


@pytest.mark.parametrize("B,pack", [(6, 3), (5, 2), (4, 4)])
def test_pack_matches_k1_memberwise(B, pack):
    """Vmapped packed solves == vmapped k=1 solves member-for-member
    (counts, statuses, f), incl. batch padding (B=5, pack=2)."""
    tw, spec = _l96_spec()
    opts = LBFGSOptions(maxiter=30, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    rf = np.float32(4e-6)
    s1 = solve_pallas.make_rung_solver(spec, opts)
    sk = solve_pack_pallas.make_packed_rung_solver(spec, opts, pack)
    xp0 = jnp.asarray(random_ensemble_inits(spec, B, seed=7,
                                            dtype=np.float32) * 1.5)
    r1 = jax.jit(jax.vmap(lambda z: s1(z, rf)))(xp0)
    rk = jax.jit(jax.vmap(lambda z: sk(z, rf)))(xp0)
    np.testing.assert_array_equal(np.asarray(rk.niter),
                                  np.asarray(r1.niter))
    np.testing.assert_array_equal(np.asarray(rk.nfev),
                                  np.asarray(r1.nfev))
    np.testing.assert_array_equal(np.asarray(rk.status),
                                  np.asarray(r1.status))
    np.testing.assert_allclose(np.asarray(rk.f), np.asarray(r1.f),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rk.x), np.asarray(r1.x),
                               atol=2e-3)


def test_pack_unbatched_matches_k1():
    tw, spec = _l96_spec(disc="euler")
    opts = LBFGSOptions(maxiter=25, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    rf = np.float32(4e-6)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(rng.normal(0, 1, spec.n_state + 1)
                      .astype(np.float32))
    r1 = solve_pallas.make_rung_solver(spec, opts)(xp0, rf)
    rk = solve_pack_pallas.make_packed_rung_solver(spec, opts, 4)(
        xp0, rf)
    assert int(rk.niter) == int(r1.niter)
    assert int(rk.nfev) == int(r1.nfev)
    assert int(rk.status) == int(r1.status)
    np.testing.assert_allclose(float(rk.f), float(r1.f), rtol=1e-5)


def test_pack_ladder_sh_stim_diag_rf():
    """Packed kernel through the scan+vmap ladder on the NaKL shape
    (SH + stimulus + diag rf): records match the k=1 kernel ladder."""
    tw = nakl_twin(N=61, dt=0.04, sigma=1.0, seed=3)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 3, 5],
                      stim=tw["stim"])
    opts = LBFGSOptions(maxiter=40, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    action, parts = make_action(spec)
    betas = jnp.arange(4, dtype=jnp.float32)
    rf0 = np.broadcast_to(
        np.float32(1e-3) * np.array([1, 1e3, 1e3, 1e3], np.float32),
        (spec.N_f - 1, 4)).astype(np.float32)
    s1 = solve_pallas.make_rung_solver(spec, opts)
    sk = solve_pack_pallas.make_packed_rung_solver(spec, opts, 2)
    rng = np.random.default_rng(5)
    xp0 = jnp.asarray(
        rng.normal(0, 0.2, (4, spec.n_state + 3)).astype(np.float32)
        + np.concatenate([np.tile([-65, 0.1, 0.6, 0.3], spec.N_f),
                          [110.0, 15.0, 0.25]]).astype(np.float32))

    def lad(solver):
        return jax.jit(jax.vmap(lambda z: run_ladder(
            action, parts, z, betas, jnp.asarray(rf0), 1.5, opts=opts,
            store_paths=False, rung_solver=solver)))(xp0)

    r1, rk = lad(s1), lad(sk)
    # not bitwise: XLA compiles different fusions for the k-pack graph,
    # and tiny SH actions amplify the reorder roundoff over rungs —
    # solver-quality equivalence is the contract (counts pinned by the
    # direct tests above)
    np.testing.assert_allclose(np.asarray(rk.A), np.asarray(r1.A),
                               rtol=2e-2)
    n1 = int(np.asarray(r1.niter).sum())
    nk = int(np.asarray(rk.niter).sum())
    assert abs(nk - n1) <= max(4, int(0.1 * n1)), (nk, n1)


def test_pack_bounded_matches_k1_memberwise():
    """Bounded (projection-in-kernel) pack == bounded k=1 kernel
    member-for-member — the shape the real campaigns run."""
    from varanneal_tpu.api import build_bounds
    tw, spec = _l96_spec()
    opts = LBFGSOptions(maxiter=30, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop", bounded_algo="projection")
    rf = np.float32(4e-6)
    lower, upper = build_bounds(
        spec, [(-6.0, 6.0)] * 20 + [(3.0, 6.0)], np.float32)
    s1 = solve_pallas.make_rung_solver(spec, opts,
                                       lower=lower, upper=upper)
    sk = solve_pack_pallas.make_packed_rung_solver(
        spec, opts, 3, lower=lower, upper=upper)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 6, seed=9,
                                            dtype=np.float32) * 3.0)
    r1 = jax.jit(jax.vmap(lambda z: s1(z, rf)))(xp0)
    rk = jax.jit(jax.vmap(lambda z: sk(z, rf)))(xp0)
    np.testing.assert_array_equal(np.asarray(rk.niter),
                                  np.asarray(r1.niter))
    np.testing.assert_array_equal(np.asarray(rk.nfev),
                                  np.asarray(r1.nfev))
    np.testing.assert_array_equal(np.asarray(rk.status),
                                  np.asarray(r1.status))
    np.testing.assert_allclose(np.asarray(rk.f), np.asarray(r1.f),
                               rtol=1e-5)
    xk = np.asarray(rk.x)
    assert np.all(xk >= np.asarray(lower)[None] - 1e-6)
    assert np.all(xk <= np.asarray(upper)[None] + 1e-6)


def test_pack_supported_predicate():
    tw, spec = _l96_spec()
    opts = LBFGSOptions(m=5)
    assert solve_pack_pallas.pack_supported(spec, np.float32(1.0),
                                            opts, 4)
    # VMEM: D=20 N=41 block ~ 48*128*4 = 24.6 KB; pack*50 blocks
    # crosses the raised 0.8*100 MB analytic budget around pack ~ 65
    assert not solve_pack_pallas.pack_supported(spec, np.float32(1.0),
                                                opts, 128)
    assert not solve_pack_pallas.pack_supported(
        spec, np.float32(1.0), LBFGSOptions(m=10), 4)
