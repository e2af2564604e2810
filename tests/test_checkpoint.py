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
