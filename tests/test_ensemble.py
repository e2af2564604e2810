"""Multi-device tests on the forced 8-device CPU mesh (SURVEY.md §4 item 3):
sharded ensemble ladders must equal the unsharded vmap bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.parallel import (
    make_ensemble_ladder, ensemble_mesh, shard_batch, random_ensemble_inits)


def _tiny_problem(seed=0):
    rng = np.random.default_rng(seed)
    D, N_data = 6, 11
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    return spec


def test_sharded_matches_unsharded():
    assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
    spec = _tiny_problem()
    action, parts = make_action(spec)
    betas = jnp.arange(3.0)
    opts = LBFGSOptions(maxiter=25, pgtol=1e-9)

    B = 16
    xp0 = random_ensemble_inits(spec, B, seed=4)

    plain = make_ensemble_ladder(action, parts, betas, 1e-4, 1.7, opts=opts,
                                 store_paths=True)
    res_plain = plain(jnp.asarray(xp0))

    mesh = ensemble_mesh(8)
    sharded_fn = make_ensemble_ladder(action, parts, betas, 1e-4, 1.7,
                                      opts=opts, store_paths=True, mesh=mesh)
    res_shard = sharded_fn(shard_batch(xp0, mesh))

    np.testing.assert_array_equal(np.asarray(res_shard.A),
                                  np.asarray(res_plain.A))
    np.testing.assert_array_equal(np.asarray(res_shard.paths),
                                  np.asarray(res_plain.paths))
    np.testing.assert_array_equal(np.asarray(res_shard.niter),
                                  np.asarray(res_plain.niter))
    # the batch axis really is sharded over all 8 devices
    assert len(res_shard.A.sharding.device_set) == 8


def test_ensemble_member_independence():
    """Each member's ladder must be independent: running a member solo gives
    the same answer as inside the sharded batch."""
    spec = _tiny_problem(seed=2)
    action, parts = make_action(spec)
    betas = jnp.arange(3.0)
    opts = LBFGSOptions(maxiter=25, pgtol=1e-9)

    B = 8
    xp0 = random_ensemble_inits(spec, B, seed=5)
    mesh = ensemble_mesh(8)
    fn = make_ensemble_ladder(action, parts, betas, 1e-4, 1.7, opts=opts,
                              store_paths=False, mesh=mesh)
    res = fn(shard_batch(xp0, mesh))

    from varanneal_tpu.anneal import run_ladder
    solo = jax.jit(lambda x: run_ladder(action, parts, x, betas, 1e-4, 1.7,
                                        opts=opts, store_paths=False))
    r3 = solo(jnp.asarray(xp0[3]))
    # batched and solo execution differ by summation order (vectorized
    # reductions) which line-search branches amplify — same minima, not
    # bitwise-identical iterates
    np.testing.assert_allclose(np.asarray(res.A)[3], np.asarray(r3.A),
                               rtol=1e-5)


def test_random_inits_init_to_data():
    spec = _tiny_problem(seed=3)
    xp0 = random_ensemble_inits(spec, 4, seed=6, init_to_data=True)
    X = xp0[:, :spec.n_state].reshape(4, spec.N_f, spec.D)
    obs = np.arange(spec.N_data) * spec.obs_stride
    for b in range(4):
        np.testing.assert_array_equal(
            X[b][obs[:, None], np.asarray(spec.Lidx)[None, :]],
            np.asarray(spec.Y))


def test_random_inits_vectorized_matches_pack():
    """The batched init builder must agree with an explicit per-member
    pack() of the same sampled states."""
    from varanneal_tpu.ops.action import pack
    spec = _tiny_problem(seed=3)
    B = 5
    xp0 = random_ensemble_inits(spec, B, seed=9, init_to_data=True)
    rng = np.random.default_rng(9)
    X0 = rng.uniform(-10.0, 10.0, size=(B, spec.N_f, spec.D))
    obs = np.arange(spec.N_data) * spec.obs_stride
    X0[:, obs[:, None], np.asarray(spec.Lidx)[None, :]] = spec.Y
    for b in range(B):
        np.testing.assert_array_equal(
            xp0[b], np.asarray(pack(spec, jnp.asarray(X0[b]))))


def test_random_inits_custom_samplers():
    spec = _tiny_problem(seed=3)
    B = 3
    xp0 = random_ensemble_inits(
        spec, B, seed=1, init_to_data=False,
        state_sampler=lambda r, s: np.full(s, 2.5),
        param_sampler=lambda r, s: np.arange(np.prod(s)).reshape(s) * 1.0)
    np.testing.assert_array_equal(xp0[:, :spec.n_state], 2.5)
    np.testing.assert_array_equal(
        xp0[:, spec.n_state:],
        np.arange(B * spec.n_par).reshape(B, spec.n_par))


def test_draw_anchored_problem_semantics():
    """draw_anchored_problem: penalty math, anchor freezing, and the
    anchored ladder holding params near their draws where the free
    ladder drifts to a bound."""
    import jax.numpy as jnp
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal.checkpoint import run_ladder_checkpointed
    from varanneal_tpu.parallel import (draw_anchored_problem,
                                        strip_anchors,
                                        random_ensemble_inits)

    rng = np.random.default_rng(0)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    B = 3
    xp0 = np.asarray(random_ensemble_inits(spec, B, seed=2), np.float64)
    n_dof = xp0.shape[1]
    lo = np.full(n_dof, -30.0); hi = np.full(n_dof, 30.0)
    lo[-1], hi[-1] = 2.0, 14.0
    draws = np.array([5.0, 9.5, 12.0])
    xp0[:, -1] = draws

    a2, p2, xp2, lo2, hi2 = draw_anchored_problem(
        action, parts, xp0, lo, hi, n_params=1, weight=3.0, width=0.25)
    assert xp2.shape == (B, n_dof + 1)
    assert lo2.shape == hi2.shape == (B, n_dof + 1)

    # penalty math: wrapped action == base action + lam*((dp)/(w*width))^2
    xp_t = jnp.asarray(xp2[0]).at[-2].add(1.5)     # move param off anchor
    base = float(action(jnp.asarray(xp2[0, :-1]).at[-1].add(1.5), 1.0))
    wdt = 12.0
    pen = 3.0 * (1.5 / (0.25 * wdt)) ** 2
    np.testing.assert_allclose(float(a2(xp_t, 1.0)), base + pen,
                               rtol=1e-12)
    a_p, me_p, fe_p = (float(v) for v in p2(xp_t, 1.0))
    np.testing.assert_allclose(a_p, base + pen, rtol=1e-12)

    # anchored ladder: anchors stay frozen at the draws, params stay
    # within the prior's reach of their OWN draw
    opts = LBFGSOptions(maxiter=25, pgtol=1e-9)
    res = run_ladder_checkpointed(
        a2, p2, jnp.asarray(xp2), np.arange(4.0), 1e-4, 1.7,
        lower=lo2, upper=hi2, opts=opts, store_paths=False,
        batched=True, batched_bounds=True)
    XP = np.asarray(res.XP)
    anchors = XP[:, -1]
    np.testing.assert_allclose(anchors, draws, atol=2e-4)   # frozen
    # each member's param near its own draw (weight 3 holds at low rf)
    assert np.all(np.abs(XP[:, -2] - draws) < 2.0)
    # distinct per-member estimates prove per-member anchoring
    assert np.all(np.diff(np.sort(XP[:, -2])) > 0.5)

    # strip_anchors: standard layout back, matching the data part
    stripped = strip_anchors(XP, 1)
    assert stripped.shape == (B, n_dof)
    v1 = float(action(jnp.asarray(stripped[0]), 1.0))
    v2 = float(a2(jnp.asarray(XP[0]), 1.0))
    assert v1 <= v2 + 1e-9                         # penalty is nonnegative


def test_draw_anchored_freeze_box_nondegenerate_f32():
    """The per-member freeze box must stay non-degenerate after the
    cast to the ensemble dtype: at |center| large relative to the box
    width, cen +- eps*width rounds to cen in f32, which would
    re-create the lo==hi breakpoint pathology in the bounded solver."""
    from varanneal_tpu.parallel import draw_anchored_problem

    def a(xp, rf):
        return (xp ** 2).sum()

    def p(xp, rf):
        return (xp ** 2).sum(), 0.0, 0.0

    xp = np.array([[0.0, 1000.0]], np.float32)
    lo = np.array([-1.0, 999.5])
    hi = np.array([1.0, 1000.5])
    _, _, xp2, lo2, hi2 = draw_anchored_problem(
        a, p, xp, lo, hi, n_params=1, weight=1.0)
    assert lo2.dtype == np.float32 and hi2.dtype == np.float32
    assert (hi2 > lo2).all()
    # the anchor coordinate still brackets its center
    assert lo2[0, -1] < xp2[0, -1] < hi2[0, -1]
