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
