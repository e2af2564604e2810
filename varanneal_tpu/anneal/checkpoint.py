"""Checkpoint / resume for long annealing runs.

The reference has NO persistence beyond save-at-end (SURVEY.md §5
"Checkpoint/resume: none — resuming means manually re-calling anneal with a
saved path as X0"). Here the warm-start state across β is just the decision
pytree, so the ladder checkpoints itself for free: β steps run in fixed-size
chunks (each chunk one jitted ``lax.scan`` — at most two compiled shapes),
and after every chunk the carry plus the per-β records land in an atomically
replaced ``.npz``. A preempted run resumes from the last completed chunk with
bit-identical continuation (same chunking → same program → same arithmetic).

Format v2: the decision variable may be ANY pytree (flat vector, the nnet
{"X","W","b"} tree, the time-sharded {"X","pest"} tree) and may carry a
leading ensemble batch axis (``batched=True`` vmaps the ladder over it).
Leaves are stored as ``xp{i}`` npz entries with the treedef string recorded
for resume validation; v1 files (flat-vector ``XP`` key) still resume.
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


def _load_resume(z, n_beta, betas, leaves0, treedef, store_paths, batched):
    """Validate a checkpoint file against this run; return resume state or
    None if it belongs to a different ladder."""
    if int(z["n_beta"]) != n_beta or not np.allclose(z["betas"], betas):
        return None
    if "XP" in z.files:                      # format v1: flat vector only
        if len(leaves0) != 1 or batched:
            return None
        xp = z["XP"]
        if xp.shape != leaves0[0].shape:
            return None
        leaves = [xp]
    else:
        if "treedef" not in z.files \
                or str(z["treedef"]) != str(treedef) \
                or int(z["n_leaves"]) != len(leaves0):
            return None
        leaves = [z[f"xp{i}"] for i in range(len(leaves0))]
        if any(l.shape != l0.shape for l, l0 in zip(leaves, leaves0)):
            return None
    XP = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])
    recs = {k: [np.asarray(z[k])] for k in _FIELDS}
    paths = None
    if store_paths:
        if "paths" in z.files:               # v1
            paths = [[np.asarray(z["paths"])]]
        elif "n_path_leaves" in z.files:
            paths = [[np.asarray(z[f"path{i}"])]
                     for i in range(int(z["n_path_leaves"]))]
        else:
            return None
    return int(z["next_idx"]), XP, recs, paths


def run_ladder_checkpointed(action, action_parts, XP0, betas, rf0, alpha, *,
                            ckpt_path: str, save_every: int = 10,
                            lower=None, upper=None,
                            opts: Optional[LBFGSOptions] = None,
                            store_paths: bool = True,
                            resume: bool = True,
                            verbose: bool = False,
                            batched: bool = False,
                            **ladder_kwargs) -> LadderResult:
    """Drop-in for :func:`run_ladder` with per-chunk checkpointing.

    ``ckpt_path``: ``.npz`` file updated after every ``save_every`` β steps.
    ``resume=True``: continue from an existing checkpoint (validated against
    the β ladder, decision-tree structure and leaf shapes); pass False to
    overwrite. ``XP0`` may be any pytree; ``batched=True`` treats the
    leading axis of every leaf as an ensemble batch and vmaps the ladder
    over it (records come back with shape (B, Nβ)).
    """
    opts = opts or LBFGSOptions()
    XP0 = jax.tree_util.tree_map(jnp.asarray, XP0)
    leaves0, treedef = jax.tree_util.tree_flatten(XP0)
    dtype = leaves0[0].dtype
    betas = np.asarray(betas)
    n_beta = len(betas)
    rec_ax = 1 if batched else 0             # the β axis of stacked records

    start = 0
    XP = XP0
    recs = {k: [] for k in _FIELDS}
    paths = None                             # list-per-leaf of chunk arrays

    if resume and os.path.exists(ckpt_path):
        with np.load(ckpt_path, allow_pickle=False) as z:
            state = _load_resume(z, n_beta, betas, leaves0, treedef,
                                 store_paths, batched)
        if state is not None:
            start, XP, recs, paths = state
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
            def base(x, b):
                return run_ladder(
                    action, action_parts, x, b, rf0, alpha, lower=lower,
                    upper=upper, opts=opts, store_paths=store_paths,
                    **ladder_kwargs)
            fn = jax.vmap(base, in_axes=(0, None)) if batched else base
            compiled[n] = jax.jit(fn)
        return compiled[n](xp, jnp.asarray(beta_chunk, dtype))

    i = start
    while i < n_beta:
        chunk = betas[i: i + save_every]
        res = run_chunk(XP, chunk)
        res = jax.tree_util.tree_map(np.asarray, res)
        XP = jax.tree_util.tree_map(jnp.asarray, res.XP)
        for k in _FIELDS:
            recs[k].append(getattr(res, k))
        if store_paths:
            pl = jax.tree_util.tree_leaves(res.paths)
            if paths is None:
                paths = [[] for _ in pl]
            for slot, leaf in zip(paths, pl):
                slot.append(leaf)
        i += len(chunk)

        xp_leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(XP)]
        payload = dict(
            n_beta=n_beta, betas=betas, next_idx=i,
            treedef=str(treedef), n_leaves=len(xp_leaves),
            **{f"xp{j}": l for j, l in enumerate(xp_leaves)},
            **{k: np.concatenate(recs[k], axis=rec_ax) for k in _FIELDS})
        if store_paths:
            payload["n_path_leaves"] = len(paths)
            for j, slot in enumerate(paths):
                payload[f"path{j}"] = np.concatenate(slot, axis=rec_ax)
        _atomic_savez(ckpt_path, **payload)
        if verbose:
            print(f"[checkpoint] beta {i}/{n_beta} saved -> {ckpt_path}")

    paths_tree = None
    if store_paths:
        # unflattening with XP0's treedef covers every case, including the
        # bare flat vector (trivial treedef -> bare array back)
        paths_tree = jax.tree_util.tree_unflatten(
            treedef, [np.concatenate(slot, axis=rec_ax) for slot in paths])

    def cat(k):
        return np.concatenate(recs[k], axis=rec_ax)

    XP_out = jax.tree_util.tree_map(np.asarray, XP)
    return LadderResult(
        XP=XP_out,
        A=cat("A"), ME=cat("ME"), FE=cat("FE"), status=cat("status"),
        niter=cat("niter"), nfev=cat("nfev"), pgnorm=cat("pgnorm"),
        paths=paths_tree)
