"""Checkpoint / resume for long annealing runs, plus the flagship
deep-solve recipe as library API.

The reference has NO persistence beyond save-at-end (SURVEY.md §5
"Checkpoint/resume: none — resuming means manually re-calling anneal with a
saved path as X0"). Here the warm-start state across β is just the decision
pytree, so the ladder checkpoints itself for free: β steps run in fixed-size
chunks (each chunk one jitted ``lax.scan`` — at most a few compiled shapes),
and after every chunk the carry plus the per-β records land in an atomically
replaced ``.npz``. A preempted run resumes from the last completed chunk with
bit-identical continuation (same chunking → same program → same arithmetic).

Recipe features promoted from the NaKL flagship example (round 3; they were
previously example-only code — VERDICT r02 weak #5):

- ``repeats=R``: every β rung is re-minimized R times, warm-started, one
  bounded dispatch each — deep per-rung solves without any single device
  dispatch exceeding this testbed's ~60 s execution cap (CLAUDE.md measured
  gotchas). Records come back per RUNG (see ``ladder.aggregate_repeats``).
- ``snapshot_beta=k``: the decision tree is recorded right after rung k
  completes all its repeats (``LadderResult.snapshot``) — the f64-polish
  restart point (f32 loses the global basin once rf amplifies residuals
  below its round-off floor; the polish must climb the last rungs from a
  pre-divergence state, PARITY.md two-phase recipe). Chunks are split
  exactly at the snapshot boundary, so the snapshot never drifts past the
  requested rung regardless of ``save_every``.
- ``meta=dict``: run-identity scalars (seed, config knobs) stored in the
  checkpoint and validated on resume — a checkpoint written under different
  settings is ignored instead of silently short-circuiting the run.

Format v3 (v2/v1 files still resume): the decision variable may be ANY
pytree (flat vector, the nnet {"X","W","b"} tree, the time-sharded
{"X","pest"} tree) and may carry a leading ensemble batch axis
(``batched=True`` vmaps the ladder over it). Leaves are stored as ``xp{i}``
npz entries with the treedef string recorded for resume validation.
"""

import os
import tempfile
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.opt.lbfgs import LBFGSOptions
from varanneal_tpu.anneal.ladder import (run_ladder, LadderResult,
                                         aggregate_repeats)

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


def _meta_matches(z, meta, verbose):
    """Compare user run-identity metadata against the checkpoint's."""
    for k, v in (meta or {}).items():
        key = f"meta_{k}"
        if key not in z.files:
            if verbose:
                print(f"[checkpoint] missing meta key {k!r}")
            return False
        if not np.array_equal(np.asarray(z[key]), np.asarray(v)):
            if verbose:
                print(f"[checkpoint] meta mismatch on {k!r}: "
                      f"{z[key]} != {v}")
            return False
    return True


def _load_resume(z, n_disp, disp_betas, leaves0, treedef, store_paths,
                 batched, meta, verbose):
    """Validate a checkpoint file against this run; return resume state or
    None if it belongs to a different ladder."""
    if int(z["n_beta"]) != n_disp or not np.allclose(z["betas"], disp_betas):
        return None
    if not _meta_matches(z, meta, verbose):
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
    snap_leaves = None
    if "n_snap_leaves" in z.files:
        snap_leaves = [np.asarray(z[f"snap{i}"])
                       for i in range(int(z["n_snap_leaves"]))]
    return int(z["next_idx"]), XP, recs, paths, snap_leaves


def run_ladder_checkpointed(action, action_parts, XP0, betas, rf0, alpha, *,
                            ckpt_path: Optional[str] = None,
                            save_every: int = 10,
                            lower=None, upper=None,
                            opts: Optional[LBFGSOptions] = None,
                            store_paths: bool = True,
                            resume: bool = True,
                            verbose: bool = False,
                            batched: bool = False,
                            batched_bounds: bool = False,
                            repeats: int = 1,
                            snapshot_beta: Optional[int] = None,
                            meta: Optional[dict] = None,
                            skip_converged_repeats: bool = True,
                            **ladder_kwargs) -> LadderResult:
    """Drop-in for :func:`run_ladder` with chunked dispatch, per-chunk
    checkpointing, per-rung repeats and a β snapshot.

    ``ckpt_path``: ``.npz`` file updated after every chunk of
    ``save_every`` dispatches (None: chunked execution without
    persistence). ``resume=True``: continue from an existing checkpoint
    (validated against the β ladder, decision-tree structure, leaf shapes
    and ``meta``); pass False to overwrite. ``XP0`` may be any pytree;
    ``batched=True`` treats the leading axis of every leaf as an ensemble
    batch and vmaps the ladder over it (records come back with shape
    (B, Nβ)). ``batched_bounds=True`` (requires ``batched``) treats the
    leading axis of ``lower``/``upper`` as the same ensemble batch —
    PER-MEMBER boxes, vmapped alongside the decision vectors (use case:
    per-member draw-anchored coordinates, member-jittered boxes).
    ``repeats``/``snapshot_beta``/``meta``: see module
    docstring. Returns per-RUNG records; ``result.snapshot`` holds the
    snapshot decision tree (or None).

    ``skip_converged_repeats`` (default True): when every ensemble member
    of a dispatch exits GRAD-CONVERGED (pgnorm ≤ pgtol — provably
    stationary: a re-dispatch exits on its first gradient test without
    moving), the remaining warm-started repeats of the SAME rung are
    skipped, duplicating the converged records into the skipped columns
    (niter/nfev get ZERO columns so the per-rung work sums stay
    truthful). Aggregated results are bit-identical to the full dispatch
    sequence; only wall time changes. ftol-converged exits are NOT
    skipped (a fresh dispatch restarts the L-BFGS memory and can descend
    further — measured).
    """
    opts = opts or LBFGSOptions()
    XP0 = jax.tree_util.tree_map(jnp.asarray, XP0)
    leaves0, treedef = jax.tree_util.tree_flatten(XP0)
    dtype = leaves0[0].dtype
    betas = np.asarray(betas)
    n_rung = len(betas)
    repeats = max(1, int(repeats))
    disp_betas = np.repeat(betas, repeats)
    n_disp = len(disp_betas)
    snap_disp = None
    if snapshot_beta is not None:
        if not 0 < snapshot_beta <= n_rung:
            raise ValueError(
                f"snapshot_beta must be in (0, {n_rung}], got "
                f"{snapshot_beta}")
        snap_disp = int(snapshot_beta) * repeats
    rec_ax = 1 if batched else 0             # the β axis of stacked records

    start = 0
    XP = XP0
    recs = {k: [] for k in _FIELDS}
    paths = None                             # list-per-leaf of chunk arrays
    snap_leaves = None

    if ckpt_path is not None and resume and os.path.exists(ckpt_path):
        with np.load(ckpt_path, allow_pickle=False) as z:
            state = _load_resume(z, n_disp, disp_betas, leaves0, treedef,
                                 store_paths, batched, meta, verbose)
        if state is not None:
            start, XP, recs, paths, snap_leaves = state
            if verbose:
                print(f"[checkpoint] resuming at dispatch index {start} "
                      f"from {ckpt_path}")
        elif verbose:
            print(f"[checkpoint] {ckpt_path} is for a different run; "
                  "starting fresh")

    # fixed-size chunks => at most a few compiled scan shapes (body +
    # ragged tail + snapshot split)
    compiled = {}

    if batched_bounds:
        if not batched:
            raise ValueError("batched_bounds requires batched=True")
        if lower is None or upper is None:
            raise ValueError("batched_bounds requires lower and upper")
        lower = jnp.asarray(lower)
        upper = jnp.asarray(upper)

    def run_chunk(xp, beta_chunk):
        n = len(beta_chunk)
        if n not in compiled:
            if batched_bounds:
                def base_b(x, b, lo_, hi_):
                    return run_ladder(
                        action, action_parts, x, b, rf0, alpha,
                        lower=lo_, upper=hi_, opts=opts,
                        store_paths=store_paths, **ladder_kwargs)
                fn = jax.vmap(base_b, in_axes=(0, None, 0, 0))
            else:
                def base(x, b):
                    return run_ladder(
                        action, action_parts, x, b, rf0, alpha,
                        lower=lower, upper=upper, opts=opts,
                        store_paths=store_paths, **ladder_kwargs)
                fn = jax.vmap(base, in_axes=(0, None)) if batched else base
            compiled[n] = jax.jit(fn)
        cb = jnp.asarray(beta_chunk, dtype)
        if batched_bounds:
            return compiled[n](xp, cb, lower, upper)
        return compiled[n](xp, cb)

    i = start
    while i < n_disp:
        end = min(i + save_every, n_disp)
        if snap_disp is not None and i < snap_disp < end:
            end = snap_disp        # never drift past the snapshot rung
        chunk = disp_betas[i:end]
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
        i = end
        if skip_converged_repeats and repeats > 1 and i % repeats != 0 \
                and i < n_disp:
            last_st = np.take(np.asarray(res.status), -1, axis=rec_ax)
            if np.all(last_st == 0):          # CONV_GRAD only (stationary)
                rung_end = ((i - 1) // repeats + 1) * repeats
                nskip = rung_end - i
                for k in _FIELDS:
                    col = np.take(np.asarray(recs[k][-1]), [-1],
                                  axis=rec_ax)
                    if k in ("niter", "nfev"):
                        col = np.zeros_like(col)
                    recs[k].append(np.repeat(col, nskip, axis=rec_ax))
                if store_paths:
                    for slot in paths:
                        col = np.take(np.asarray(slot[-1]), [-1],
                                      axis=rec_ax)
                        slot.append(np.repeat(col, nskip, axis=rec_ax))
                i = rung_end
        if snap_disp is not None and i == snap_disp:
            snap_leaves = [np.asarray(l)
                           for l in jax.tree_util.tree_leaves(XP)]

        if ckpt_path is not None:
            xp_leaves = [np.asarray(l)
                         for l in jax.tree_util.tree_leaves(XP)]
            payload = dict(
                n_beta=n_disp, betas=disp_betas, next_idx=i,
                repeats=repeats,
                treedef=str(treedef), n_leaves=len(xp_leaves),
                **{f"xp{j}": l for j, l in enumerate(xp_leaves)},
                **{k: np.concatenate(recs[k], axis=rec_ax)
                   for k in _FIELDS},
                **{f"meta_{k}": np.asarray(v)
                   for k, v in (meta or {}).items()})
            if snap_leaves is not None:
                payload["n_snap_leaves"] = len(snap_leaves)
                for j, l in enumerate(snap_leaves):
                    payload[f"snap{j}"] = l
            if store_paths:
                payload["n_path_leaves"] = len(paths)
                for j, slot in enumerate(paths):
                    payload[f"path{j}"] = np.concatenate(slot, axis=rec_ax)
            _atomic_savez(ckpt_path, **payload)
        if verbose:
            a_last = recs["A"][-1]
            a_min = float(np.min(np.asarray(a_last)[..., -1]))
            where = f" saved -> {ckpt_path}" if ckpt_path else ""
            print(f"[checkpoint] dispatch {i}/{n_disp} "
                  f"A_min={a_min:.6g}{where}", flush=True)

    paths_tree = None
    if store_paths:
        # unflattening with XP0's treedef covers every case, including the
        # bare flat vector (trivial treedef -> bare array back)
        paths_tree = jax.tree_util.tree_unflatten(
            treedef, [np.concatenate(slot, axis=rec_ax) for slot in paths])

    def cat(k):
        return np.concatenate(recs[k], axis=rec_ax)

    snapshot = None
    if snap_leaves is not None:
        snapshot = jax.tree_util.tree_unflatten(treedef, snap_leaves)

    XP_out = jax.tree_util.tree_map(np.asarray, XP)
    res = LadderResult(
        XP=XP_out,
        A=cat("A"), ME=cat("ME"), FE=cat("FE"), status=cat("status"),
        niter=cat("niter"), nfev=cat("nfev"), pgnorm=cat("pgnorm"),
        paths=paths_tree)
    res = aggregate_repeats(res, n_rung, repeats, rec_ax=rec_ax)
    return res._replace(snapshot=snapshot)
