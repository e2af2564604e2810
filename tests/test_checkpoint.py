"""Checkpoint/resume: interrupted runs must continue bit-identically."""

import numpy as np
import jax.numpy as jnp

from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal.checkpoint import run_ladder_checkpointed
from varanneal_tpu.parallel import random_ensemble_inits


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, 1, seed=1)[0])
    return action, parts, xp0


def test_checkpoint_resume_bit_identical(tmp_path):
    action, parts, xp0 = _setup()
    betas = np.arange(11.0)             # ragged tail: chunks 4+4+3
    opts = LBFGSOptions(maxiter=20, pgtol=1e-9)
    kw = dict(ckpt_path=str(tmp_path / "ck.npz"), save_every=4, opts=opts,
              store_paths=True)

    full = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                   resume=False, **kw)

    # simulate preemption: run only the first 2 chunks (8 betas), then
    # resume the full ladder from the checkpoint
    kw2 = dict(kw, ckpt_path=str(tmp_path / "ck2.npz"))
    run_ladder_checkpointed(action, parts, xp0, betas[:8], 1e-4, 1.7,
                            resume=False, **kw2)
    # patch the partial checkpoint to the full ladder's metadata, as a
    # preempted full run would have written it
    import numpy as _np
    with _np.load(kw2["ckpt_path"]) as z:
        payload = {k: z[k] for k in z.files}
    payload["n_beta"] = np.asarray(11)
    payload["betas"] = betas
    _np.savez(kw2["ckpt_path"], **payload)

    resumed = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                      resume=True, **kw2)

    np.testing.assert_array_equal(resumed.A, full.A)
    np.testing.assert_array_equal(resumed.XP, full.XP)
    np.testing.assert_array_equal(resumed.paths, full.paths)
    np.testing.assert_array_equal(resumed.niter, full.niter)


def test_checkpoint_mismatch_starts_fresh(tmp_path):
    action, parts, xp0 = _setup()
    opts = LBFGSOptions(maxiter=10)
    p = str(tmp_path / "ck.npz")
    run_ladder_checkpointed(action, parts, xp0, np.arange(4.0), 1e-4, 1.7,
                            ckpt_path=p, save_every=2, opts=opts,
                            resume=False)
    # different ladder length -> checkpoint ignored, fresh run succeeds
    res = run_ladder_checkpointed(action, parts, xp0, np.arange(6.0),
                                  1e-4, 1.7, ckpt_path=p, save_every=2,
                                  opts=opts, resume=True)
    assert len(res.A) == 6
    assert np.all(np.isfinite(res.A))


def _tree_setup(seed=0):
    """Structured {"X","pest"} decision tree on the same tiny problem."""
    from varanneal_tpu.ops.action import make_action_tree, tree_of_flat
    rng = np.random.default_rng(seed)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    from varanneal_tpu.ops import build_spec
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    action, parts = make_action_tree(spec)
    xp0 = tree_of_flat(spec, jnp.asarray(
        random_ensemble_inits(spec, 1, seed=1)[0]))
    return action, parts, xp0


def test_checkpoint_pytree_resume(tmp_path):
    """v2: arbitrary decision pytrees checkpoint and resume bit-identically
    (the time-sharded / nnet decision-variable case)."""
    action, parts, xp0 = _tree_setup()
    betas = np.arange(7.0)
    opts = LBFGSOptions(maxiter=15, pgtol=1e-9)
    kw = dict(save_every=3, opts=opts, store_paths=True)

    full = run_ladder_checkpointed(
        action, parts, xp0, betas, 1e-4, 1.7, resume=False,
        ckpt_path=str(tmp_path / "t.npz"), **kw)

    p2 = str(tmp_path / "t2.npz")
    run_ladder_checkpointed(action, parts, xp0, betas[:6], 1e-4, 1.7,
                            resume=False, ckpt_path=p2, **kw)
    with np.load(p2) as z:
        payload = {k: z[k] for k in z.files}
    payload["n_beta"] = np.asarray(7)
    payload["betas"] = betas
    np.savez(p2, **payload)
    resumed = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                      resume=True, ckpt_path=p2, **kw)

    np.testing.assert_array_equal(resumed.A, full.A)
    np.testing.assert_array_equal(resumed.XP["X"], full.XP["X"])
    np.testing.assert_array_equal(resumed.XP["pest"], full.XP["pest"])
    np.testing.assert_array_equal(resumed.paths["X"], full.paths["X"])


def test_checkpoint_batched_ensemble_resume(tmp_path):
    """v2: vmapped ensemble ladders checkpoint with (B, Nbeta) records and
    resume bit-identically."""
    action, parts, _ = _setup()
    from varanneal_tpu.ops import build_spec
    rng = np.random.default_rng(0)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    B = 4
    xp0 = jnp.asarray(random_ensemble_inits(spec, B, seed=2))
    betas = np.arange(6.0)
    opts = LBFGSOptions(maxiter=15, pgtol=1e-9)
    kw = dict(save_every=2, opts=opts, store_paths=False, batched=True)

    full = run_ladder_checkpointed(
        action, parts, xp0, betas, 1e-4, 1.7, resume=False,
        ckpt_path=str(tmp_path / "b.npz"), **kw)
    assert full.A.shape == (B, 6)

    p2 = str(tmp_path / "b2.npz")
    run_ladder_checkpointed(action, parts, xp0, betas[:4], 1e-4, 1.7,
                            resume=False, ckpt_path=p2, **kw)
    with np.load(p2) as z:
        payload = {k: z[k] for k in z.files}
    payload["n_beta"] = np.asarray(6)
    payload["betas"] = betas
    np.savez(p2, **payload)
    resumed = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                      resume=True, ckpt_path=p2, **kw)
    np.testing.assert_array_equal(resumed.A, full.A)
    np.testing.assert_array_equal(resumed.XP, full.XP)


def test_batched_bounds_per_member(tmp_path):
    """batched_bounds=True: each ensemble member is solved in ITS OWN box
    (leading batch axis on lower/upper), matching per-member single-ladder
    runs; resume stays bit-identical."""
    from varanneal_tpu.anneal.ladder import run_ladder
    rng = np.random.default_rng(0)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    action, parts = make_action(spec)
    B = 3
    xp0 = jnp.asarray(random_ensemble_inits(spec, B, seed=2),
                      dtype=jnp.float64)
    n_dof = xp0.shape[1]
    # shared wide state box; a DIFFERENT parameter box per member, each
    # placed so the bound binds differently (truth F = 8.0)
    pboxes = [(7.5, 7.6), (8.2, 8.4), (6.0, 6.5)]
    lo = np.full((B, n_dof), -30.0)
    hi = np.full((B, n_dof), 30.0)
    for b, (pl, ph) in enumerate(pboxes):
        lo[b, -1], hi[b, -1] = pl, ph
    xp0 = jnp.clip(xp0, lo, hi)
    betas = np.arange(5.0)
    opts = LBFGSOptions(maxiter=15, pgtol=1e-9)

    res = run_ladder_checkpointed(
        action, parts, xp0, betas, 1e-4, 1.7, resume=False,
        ckpt_path=str(tmp_path / "pb.npz"), save_every=2, opts=opts,
        store_paths=False, batched=True, batched_bounds=True,
        lower=lo, upper=hi)
    assert res.A.shape == (B, 5)
    XP = np.asarray(res.XP)
    for b, (pl, ph) in enumerate(pboxes):
        assert pl - 1e-12 <= XP[b, -1] <= ph + 1e-12
        # per-member single run with the same box must agree
        single = run_ladder(action, parts, xp0[b], betas, 1e-4, 1.7,
                            lower=jnp.asarray(lo[b]),
                            upper=jnp.asarray(hi[b]), opts=opts,
                            store_paths=False)
        # vmapped and single lowerings differ at round-off and the
        # nonconvex solve amplifies it — same basin, loose tolerance
        np.testing.assert_allclose(XP[b], np.asarray(single.XP),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.A)[b],
                                   np.asarray(single.A), rtol=1e-4)

    # resume bit-identically mid-ladder under batched bounds
    p2 = str(tmp_path / "pb2.npz")
    kw = dict(save_every=2, opts=opts, store_paths=False, batched=True,
              batched_bounds=True, lower=lo, upper=hi)
    run_ladder_checkpointed(action, parts, xp0, betas[:4], 1e-4, 1.7,
                            resume=False, ckpt_path=p2, **kw)
    with np.load(p2) as z:
        payload = {k: z[k] for k in z.files}
    payload["n_beta"] = np.asarray(5)
    payload["betas"] = betas
    np.savez(p2, **payload)
    resumed = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                      resume=True, ckpt_path=p2, **kw)
    np.testing.assert_array_equal(resumed.A, res.A)
    np.testing.assert_array_equal(resumed.XP, res.XP)


def test_repeats_aggregation_matches_expanded_ladder(tmp_path):
    """repeats=R must equal running the β sequence with every rung
    repeated R times (warm-started), with records aggregated per rung:
    A/status/pgnorm from the last repeat, nfev/niter summed."""
    action, parts, xp0 = _setup()
    betas = np.arange(5.0)
    opts = LBFGSOptions(maxiter=8, pgtol=1e-12)   # force MAXITER exits so
    # repeats actually change the iterate
    rep = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                  save_every=3, opts=opts,
                                  store_paths=False, repeats=3)
    exp = run_ladder_checkpointed(action, parts, xp0,
                                  np.repeat(betas, 3), 1e-4, 1.7,
                                  save_every=3, opts=opts,
                                  store_paths=False)
    assert rep.A.shape == (5,)
    np.testing.assert_array_equal(rep.XP, exp.XP)
    np.testing.assert_array_equal(rep.A, exp.A.reshape(5, 3)[:, -1])
    np.testing.assert_array_equal(rep.nfev, exp.nfev.reshape(5, 3).sum(1))
    # deeper solves: repeated rungs end at (weakly) lower action
    assert np.all(rep.A <= exp.A.reshape(5, 3)[:, 0] + 1e-12)


def test_snapshot_beta_exact_state(tmp_path):
    """result.snapshot == the decision state after exactly k rungs, even
    when k is not a multiple of save_every (chunks split at the snapshot
    boundary — the round-2 ADVICE drift bug, fixed in-library)."""
    action, parts, xp0 = _setup()
    betas = np.arange(7.0)
    opts = LBFGSOptions(maxiter=15, pgtol=1e-9)
    res = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                  save_every=2, opts=opts,
                                  store_paths=False, snapshot_beta=3)
    ref = run_ladder_checkpointed(action, parts, xp0, betas[:3], 1e-4, 1.7,
                                  save_every=2, opts=opts,
                                  store_paths=False)
    assert res.snapshot is not None
    np.testing.assert_array_equal(np.asarray(res.snapshot),
                                  np.asarray(ref.XP))
    # snapshot survives a checkpoint crash/resume
    p = str(tmp_path / "s.npz")
    run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                            ckpt_path=p, save_every=2, opts=opts,
                            store_paths=False, snapshot_beta=3,
                            resume=False)
    res2 = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                   ckpt_path=p, save_every=2, opts=opts,
                                   store_paths=False, snapshot_beta=3,
                                   resume=True)
    np.testing.assert_array_equal(np.asarray(res2.snapshot),
                                  np.asarray(res.snapshot))


def test_repeats_with_snapshot_and_batch():
    """Snapshot indexing under repeats: taken after ALL repeats of the
    snapshot rung, batched records stay (B, Nrung)."""
    action, parts, _ = _setup()
    rng = np.random.default_rng(0)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    spec = build_spec(lorenz96, D, Y, t, [0, 2, 4], 4.0,
                      disc="trapezoid", P=np.array([8.0]), pidx=[0])
    xp0 = jnp.asarray(random_ensemble_inits(spec, 3, seed=2))
    betas = np.arange(4.0)
    opts = LBFGSOptions(maxiter=6, pgtol=1e-12)
    res = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                  save_every=3, opts=opts,
                                  store_paths=False, batched=True,
                                  repeats=2, snapshot_beta=2)
    assert res.A.shape == (3, 4)
    assert np.asarray(res.snapshot).shape == xp0.shape
    ref = run_ladder_checkpointed(action, parts, xp0,
                                  np.repeat(betas[:2], 2), 1e-4, 1.7,
                                  save_every=3, opts=opts,
                                  store_paths=False, batched=True)
    np.testing.assert_array_equal(np.asarray(res.snapshot),
                                  np.asarray(ref.XP))


def test_meta_mismatch_starts_fresh(tmp_path, capsys):
    """A checkpoint written under different run-identity metadata must be
    ignored on resume (the round-2 ADVICE silent-short-circuit bug)."""
    action, parts, xp0 = _setup()
    betas = np.arange(4.0)
    opts = LBFGSOptions(maxiter=10)
    p = str(tmp_path / "m.npz")
    run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                            ckpt_path=p, save_every=2, opts=opts,
                            store_paths=False, resume=False,
                            meta=dict(seed=3, gate_rf_scale=1000.0))
    # same meta: completed checkpoint short-circuits (no fresh message)
    run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                            ckpt_path=p, save_every=2, opts=opts,
                            store_paths=False, resume=True, verbose=True,
                            meta=dict(seed=3, gate_rf_scale=1000.0))
    out = capsys.readouterr().out
    assert "resuming at dispatch index 4" in out
    # changed seed: checkpoint must be rejected
    run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                            ckpt_path=p, save_every=2, opts=opts,
                            store_paths=False, resume=True, verbose=True,
                            meta=dict(seed=4, gate_rf_scale=1000.0))
    out = capsys.readouterr().out
    assert "starting fresh" in out


def test_facade_repeats_snapshot():
    """The Annealer facade exposes repeats/snapshot_beta (no checkpoint
    file needed) and stores the snapshot."""
    from varanneal_tpu.api import Annealer
    rng = np.random.default_rng(2)
    D, N_data = 6, 13
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 3))
    ann = Annealer()
    ann.set_model(lorenz96, D)
    ann.set_data(Y, t=t)
    X0 = rng.normal(size=(N_data, D))
    ann.anneal(X0, np.array([8.0]), 1.7, np.arange(5), 4.0, 1e-4,
               [0, 2, 4], [0], opt_args=dict(maxiter=10),
               repeats=2, snapshot_beta=3, engine="xla")
    assert ann.A_array.shape == (5,)
    assert ann.XP_snapshot is not None
    assert np.asarray(ann.XP_snapshot).shape == ann.XP_final.shape
    assert np.all(np.isfinite(ann.A_array))


def test_checkpoint_nnet_facade(tmp_path):
    """The nnet Annealer checkpoints/resumes through its facade kwargs."""
    from varanneal_tpu import nnet
    rng = np.random.default_rng(3)
    U = rng.normal(size=(12, 2))
    W_true = rng.normal(size=(1, 2))
    Yd = np.tanh(U @ W_true.T)
    betas = np.arange(6)

    def make():
        ann = nnet.Annealer()
        ann.set_structure([2, 3, 1])
        ann.set_activation("tanh")
        ann.set_input_data(U)
        ann.set_output_data(Yd)
        return ann

    a1 = make()
    a1.anneal(1.6, betas, 1.0, 1e-3, seed=5,
              opt_args=dict(maxiter=20),
              checkpoint_path=str(tmp_path / "nn.npz"), checkpoint_every=2,
              resume=False)
    # resume from the finished checkpoint: must reload without re-running
    a2 = make()
    a2.anneal(1.6, betas, 1.0, 1e-3, seed=5,
              opt_args=dict(maxiter=20),
              checkpoint_path=str(tmp_path / "nn.npz"), checkpoint_every=2,
              resume=True)
    np.testing.assert_array_equal(a1.A_array, a2.A_array)
    W1, b1 = a1.weights_at(-1)
    W2, b2 = a2.weights_at(-1)
    for w1, w2 in zip(W1, W2):
        np.testing.assert_array_equal(w1, w2)


def test_skip_converged_repeats_identical_and_cheaper(tmp_path):
    """With generous maxiter every rung grad-converges on its first
    dispatch; skipping the remaining repeats must leave XP and all
    per-rung records identical to the no-skip run while recording zero
    extra work (niter/nfev sums equal the single-dispatch values).
    pgtol is loose enough that exits are CONV_GRAD (stationary), the only
    status the skip trusts."""
    action, parts, xp0 = _setup()
    betas = np.arange(4.0)
    opts = LBFGSOptions(maxiter=400, pgtol=1e-5, ftol=0.0)
    skip = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                   save_every=1, opts=opts,
                                   store_paths=False, repeats=4)
    legacy = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                     save_every=1, opts=opts,
                                     store_paths=False, repeats=4,
                                     skip_converged_repeats=False)
    one = run_ladder_checkpointed(action, parts, xp0, betas, 1e-4, 1.7,
                                  save_every=1, opts=opts,
                                  store_paths=False, repeats=1)
    assert np.all(skip.status == 0)
    np.testing.assert_array_equal(skip.XP, legacy.XP)
    np.testing.assert_array_equal(skip.A, legacy.A)
    np.testing.assert_array_equal(skip.pgnorm, legacy.pgnorm)
    # skipped repeats record zero work: per-rung sums collapse to the
    # first dispatch's counts
    np.testing.assert_array_equal(skip.niter, one.niter)
    np.testing.assert_array_equal(skip.nfev, one.nfev)
    assert np.all(legacy.nfev >= skip.nfev)


def test_skip_converged_repeats_batched_checkpoint_resume(tmp_path):
    """Skip bookkeeping must stay consistent with per-chunk checkpoint
    resume for a batched ensemble: killing after a mid-rung chunk and
    resuming reproduces the uninterrupted run bit-for-bit."""
    action, parts, xp0 = _setup()
    xp0b = jnp.stack([xp0, xp0 + 0.01])
    betas = np.arange(3.0)
    opts = LBFGSOptions(maxiter=400, pgtol=1e-5, ftol=0.0)
    kw = dict(save_every=1, opts=opts, store_paths=False, repeats=3,
              batched=True)
    full = run_ladder_checkpointed(action, parts, xp0b, betas, 1e-4, 1.7,
                                   **kw)
    ck = str(tmp_path / "skip.npz")
    run_ladder_checkpointed(action, parts, xp0b, betas[:2], 1e-4, 1.7,
                            ckpt_path=ck, **kw)
    resumed = run_ladder_checkpointed(action, parts, xp0b, betas, 1e-4,
                                      1.7, ckpt_path=ck, **kw)
    np.testing.assert_array_equal(full.XP, resumed.XP)
    np.testing.assert_array_equal(full.A, resumed.A)
