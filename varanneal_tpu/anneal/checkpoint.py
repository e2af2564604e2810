"""Checkpoint / resume for long annealing runs.

The reference has NO persistence beyond save-at-end (SURVEY.md §5
"Checkpoint/resume: none — resuming means manually re-calling anneal with a
saved path as X0"). Here the warm-start state across β is just the decision
pytree, so the ladder checkpoints itself for free: β steps run in fixed-size
chunks (each chunk one jitted ``lax.scan`` — at most two compiled shapes),
and after every chunk the carry plus the per-β records land in an atomically
replaced ``.npz``. A preempted run resumes from the last completed chunk with
bit-identical continuation (same chunking → same program → same arithmetic).
"""

import os
import tempfile
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.opt.lbfgs import LBFGSOptions
from varanneal_tpu.anneal.ladder import run_ladder, LadderResult

_FIELDS = ("A", "ME", "FE", "status", "niter", "nfev", "pgnorm")


def _atomic_savez(path, **arrays):
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        # write through the fd: np.savez(path) would append ".npz" and the
        # rename would move an empty file
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def run_ladder_checkpointed(action, action_parts, XP0, betas, rf0, alpha, *,
                            ckpt_path: str, save_every: int = 10,
                            lower=None, upper=None,
                            opts: Optional[LBFGSOptions] = None,
                            store_paths: bool = True,
                            resume: bool = True,
                            verbose: bool = False,
                            **ladder_kwargs) -> LadderResult:
    """Drop-in for :func:`run_ladder` with per-chunk checkpointing.

    ``ckpt_path``: ``.npz`` file updated after every ``save_every`` β steps.
    ``resume=True``: continue from an existing checkpoint (validated by β
    count); pass False to overwrite. Flat (1-leaf) decision vectors only
    for the checkpoint format v1.
    """
    opts = opts or LBFGSOptions()
    XP0 = jnp.asarray(XP0)
    betas = np.asarray(betas)
    n_beta = len(betas)

    start = 0
    XP = XP0
    recs = {k: [] for k in _FIELDS}
    paths = []

    if resume and os.path.exists(ckpt_path):
        with np.load(ckpt_path) as z:
            if int(z["n_beta"]) == n_beta and np.allclose(
                    z["betas"], betas):
                start = int(z["next_idx"])
                XP = jnp.asarray(z["XP"])
                for k in _FIELDS:
                    recs[k] = list(z[k])
                if store_paths and "paths" in z.files:
                    paths = list(z["paths"])
                if verbose:
                    print(f"[checkpoint] resuming at beta index {start} "
                          f"from {ckpt_path}")
            elif verbose:
                print(f"[checkpoint] {ckpt_path} is for a different ladder; "
                      "starting fresh")

    # fixed-size chunks => at most two compiled scan shapes (body + ragged
    # tail)
    compiled = {}

    def run_chunk(xp, beta_chunk):
        n = len(beta_chunk)
        if n not in compiled:
            compiled[n] = jax.jit(lambda x, b: run_ladder(
                action, action_parts, x, b, rf0, alpha, lower=lower,
                upper=upper, opts=opts, store_paths=store_paths,
                **ladder_kwargs))
        return compiled[n](xp, jnp.asarray(beta_chunk, XP0.dtype))

    i = start
    while i < n_beta:
        chunk = betas[i: i + save_every]
        res = run_chunk(XP, chunk)
        res = jax.tree_util.tree_map(np.asarray, res)
        XP = jnp.asarray(res.XP)
        for k in _FIELDS:
            recs[k].extend(getattr(res, k))
        if store_paths:
            paths.extend(res.paths)
        i += len(chunk)
        payload = dict(n_beta=n_beta, betas=betas, next_idx=i,
                       XP=np.asarray(XP),
                       **{k: np.asarray(recs[k]) for k in _FIELDS})
        if store_paths:
            payload["paths"] = np.asarray(paths)
        _atomic_savez(ckpt_path, **payload)
        if verbose:
            print(f"[checkpoint] beta {i}/{n_beta} saved -> {ckpt_path}")

    return LadderResult(
        XP=np.asarray(XP),
        A=np.asarray(recs["A"]), ME=np.asarray(recs["ME"]),
        FE=np.asarray(recs["FE"]), status=np.asarray(recs["status"]),
        niter=np.asarray(recs["niter"]), nfev=np.asarray(recs["nfev"]),
        pgnorm=np.asarray(recs["pgnorm"]),
        paths=np.asarray(paths) if store_paths else None)
