"""Staged ensemble estimation — the measured flagship recipe as ONE
library entry point.

The round-3 campaigns (PARITY.md) established a working recipe for
hard, degenerate inverse problems (the 18-parameter voltage-only NaKL
being the flagship): draw an ensemble from (optionally tight,
literature-style) prior boxes, anchor each member's parameters to its
OWN draw with a weak MAP prior (multi-start regularized annealing,
``parallel.draw_anchored_problem``), run the f32 screening ladder in
CHUNKED dispatches with per-rung repeats and a pre-divergence snapshot
(f32 saturates the action at high rf — measured round 2), rank members
by action, strip the anchors, and polish the top members at f64 in
small sequential batches.

Until round 4 that composition lived only in a 700-line example CLI
(``examples/nakl_ensemble.py``) — this module promotes it to the
library (round-3 VERDICT item 3): ``phase1`` + ``polish`` are the two
stages, ``estimate`` the one-call composition. The example is now a
thin argument-parser over these.

The polish stage enforces the measured TPU-worker stability envelope
at the API level (round-3 VERDICT item 4): the f64 NaKL-SH polish
program at ensemble B=6 crashes this testbed's TPU worker
DETERMINISTICALLY at its first dispatch (6 identical crash/recover
cycles, CLAUDE.md round-3 gotchas) while B=4 runs clean, so
``polish(batch=None)`` batch-splits at :func:`safe_polish_batch`
members per dispatch on TPU backends instead of leaving the guard to
example code.

Reference semantics: the reference has no staged workflow — each
``Annealer.anneal`` call is one ladder and ensembles/polish are manual
script loops around it [M, SURVEY.md §2]. This is the TPU-native
production form of that loop: vmapped ensembles, chunked dispatches,
crash-resumable checkpoints, dtype-staged arithmetic.
"""

import time
import warnings
from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal.checkpoint import run_ladder_checkpointed
from varanneal_tpu.parallel import draw_anchored_problem, strip_anchors

# dispatch seam: polish()'s retry loop calls this; tests monkeypatch it
# to inject worker faults
_dispatch = run_ladder_checkpointed

_TRANSIENT_MARKERS = ("UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED",
                      "socket closed", "connection", "Connection",
                      "worker", "INTERNAL")


def _is_transient(e: BaseException) -> bool:
    """Classify a dispatch failure as a (possibly-recoverable) runtime/
    worker fault rather than a programming error. Type-first: any
    jaxlib runtime error (XlaRuntimeError and friends) counts — the
    measured failure mode on this testbed is the TPU worker crashing or
    hanging mid-dispatch (CLAUDE.md), which surfaces as XlaRuntimeError
    UNAVAILABLE/INTERNAL from an otherwise-valid program. Python-side
    errors (TypeError, ValueError, ...) are never transient."""
    name = type(e).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError"):
        return True
    if isinstance(e, (TypeError, ValueError, KeyError, AttributeError,
                      AssertionError)):
        return False
    return isinstance(e, (RuntimeError, OSError)) and any(
        s in str(e) for s in _TRANSIENT_MARKERS)


def _maybe_rung_solver(spec, rf0, opts, solver, rung_solver, lower,
                       upper, dtype, anchored=False):
    """Workflow-side wrapper of the shared facade gate
    (``kernels.solve_pallas.pick_rung_solver``). An explicit
    ``rung_solver`` wins; anchored problems pin the generic loop (the
    fused kernel's in-kernel action cannot see the anchor penalty)."""
    if rung_solver is not None:
        return rung_solver
    if spec is None or solver == "generic":
        return None
    if anchored:
        if solver == "fused":
            warnings.warn(
                "solver='fused' is unavailable for anchor_weight > 0 "
                "(the fused kernel evaluates the raw spec action, not "
                "the anchored one); using the generic solver",
                stacklevel=3)
        return None
    from varanneal_tpu.kernels.solve_pallas import pick_rung_solver
    opts = opts or LBFGSOptions()
    return pick_rung_solver(spec, rf0, opts, solver=solver,
                            lower=lower, upper=upper, dtype=dtype)


def safe_polish_batch() -> int:
    """Largest f64 polish ensemble per dispatch that is measured SAFE on
    the TPU backend. B=6 crashes the worker deterministically, B=4 runs
    clean (two independent campaigns; CLAUDE.md round-3 gotchas); the
    B∈{4,5,6,8} bisection lives in ``benchmarks/f64_crash_repro.py``.
    On non-TPU backends there is no such envelope (returns a no-split
    sentinel handled by :func:`polish`)."""
    try:
        import jax
        if jax.default_backend() == "tpu":
            return 4
    except Exception:  # pragma: no cover
        pass
    return 0           # 0 = no limit (CPU/GPU: no measured crash)


class Phase1Result(NamedTuple):
    XP: np.ndarray          # (B, n[+n_params anchors]) final states
    A: np.ndarray           # (B, n_rungs) per-rung actions
    ME: np.ndarray
    FE: np.ndarray
    status: np.ndarray
    niter: np.ndarray
    nfev: np.ndarray
    snapshot: Optional[np.ndarray]   # (B, n...) state at snapshot_beta
    order: np.ndarray       # members sorted by final-rung action
    anchored: bool          # XP/snapshot carry anchor coordinates


def phase1(action, parts, xp0, betas, rf0, alpha, *, lower=None,
           upper=None, opts: Optional[LBFGSOptions] = None,
           n_params: int = 0, anchor_weight: float = 0.0,
           anchor_width: float = 0.25, repeats: int = 1,
           snapshot_beta: Optional[int] = None,
           checkpoint_stem: Optional[str] = None, save_every: int = 2,
           rf_min=None, rf_max=None, meta: Optional[dict] = None,
           spec=None, solver: str = "auto", rung_solver=None,
           verbose: bool = False) -> Phase1Result:
    """Screening-ladder stage: (optionally own-draw-anchored) batched
    annealing with chunked dispatches, per-rung ``repeats``, an optional
    pre-divergence ``snapshot_beta``, and crash-resumable checkpointing
    at ``checkpoint_stem + '_p1_ckpt.npz'`` (the exact layout the
    campaign runners resume from).

    ``spec``/``solver``/``rung_solver`` (round-5, VERDICT r4 #3): pass
    the problem's ``ProblemSpec`` to let the screen ride the fused
    whole-solve Pallas kernel through the SAME gate as the facade
    (``solver='auto'``: only in the measured-win envelope; ``'fused'``:
    forced where supported; ``'generic'``: XLA loop). An explicit
    ``rung_solver`` callable overrides the gate. Anchored screens
    (``anchor_weight > 0``) always use the generic loop — the fused
    kernel's in-kernel action cannot see the anchor penalty.

    ``xp0``: (B, n) ensemble of packed decision vectors whose trailing
    ``n_params`` coordinates are the estimated parameters.
    ``anchor_weight > 0`` applies the measured multi-start-regularized
    recipe: each member's parameters are softly anchored to its own
    draw (``parallel.draw_anchored_problem``); the returned ``XP`` and
    ``snapshot`` then carry the anchor centers as extra trailing
    coordinates (``anchored=True`` — strip with ``parallel.
    strip_anchors`` or let :func:`polish` do it).
    """
    xp0 = np.asarray(xp0)
    if xp0.ndim != 2:
        raise ValueError(f"xp0 must be (B, n), got {xp0.shape}")
    anchored = bool(anchor_weight)
    lo_run, hi_run = lower, upper
    if anchored:
        if not n_params:
            raise ValueError("anchor_weight requires n_params > 0")
        action, parts, xp0, lo_run, hi_run = draw_anchored_problem(
            action, parts, xp0, np.asarray(lower), np.asarray(upper),
            n_params=n_params, weight=anchor_weight, width=anchor_width)
    rung_solver = _maybe_rung_solver(spec, rf0, opts, solver,
                                     rung_solver, lower, upper,
                                     xp0.dtype, anchored=anchored)
    res = run_ladder_checkpointed(
        action, parts, jnp.asarray(xp0), betas, rf0, alpha,
        ckpt_path=(checkpoint_stem + "_p1_ckpt.npz"
                   if checkpoint_stem else None),
        save_every=save_every, lower=lo_run, upper=hi_run, opts=opts,
        store_paths=False, batched=True, batched_bounds=anchored,
        repeats=repeats, snapshot_beta=snapshot_beta, meta=meta,
        verbose=verbose, rf_min=rf_min, rf_max=rf_max,
        rung_solver=rung_solver)
    A = np.asarray(res.A)
    return Phase1Result(
        XP=np.asarray(res.XP), A=A, ME=np.asarray(res.ME),
        FE=np.asarray(res.FE), status=np.asarray(res.status),
        niter=np.asarray(res.niter), nfev=np.asarray(res.nfev),
        snapshot=(None if res.snapshot is None
                  else np.asarray(res.snapshot)),
        order=np.argsort(A[:, -1]), anchored=anchored)


class PolishResult(NamedTuple):
    XP: np.ndarray          # (K, n) polished states, in ``picks`` order
    A: np.ndarray           # (K, n_rungs) per-rung polish actions
    picks: np.ndarray       # member indices polished (into phase-1 batch)
    order: np.ndarray       # rows of XP sorted by final polished action


def polish(action, parts, src, betas, rf0, alpha, *, lower=None,
           upper=None, opts: Optional[LBFGSOptions] = None,
           picks=None, anchored_n_params: int = 0,
           batch: Optional[int] = None, repeats: int = 1,
           checkpoint_stem: Optional[str] = None, save_every: int = 2,
           rf_min=None, rf_max=None, dtype=np.float64,
           meta: Optional[dict] = None,
           spec=None, solver: str = "auto", rung_solver=None,
           retries: int = 2, retry_wait: float = 30.0,
           verbose: bool = False) -> PolishResult:
    """Accuracy-grade polish stage: re-anneal the selected members up
    the top rungs at ``dtype`` (f64 by default — the f32 ladder's
    action saturates at high rf, measured round 2), in SEQUENTIAL
    member batches of at most ``batch`` per dispatch.

    ``src``: (B, n) phase-1 states (typically ``Phase1Result.snapshot``
    if one was taken, else ``.XP``); ``picks``: member indices to
    polish (default: all rows of ``src``). ``anchored_n_params > 0``
    strips that many anchor-center coordinates first (the polish is
    prior-free, matching the measured recipe). ``batch=None`` applies
    the measured worker-stability envelope (:func:`safe_polish_batch`:
    ≤4 members per dispatch on TPU, unlimited elsewhere); pass an
    explicit int to override. Checkpoints (crash-resume) per batch at
    ``checkpoint_stem + '_pol_ckpt.npz'`` / ``'_pol{i}_ckpt.npz'`` —
    the exact names the round-3 campaign runners used, so in-flight
    saves stay resumable.

    ``retries`` (round-5, VERDICT r4 #4): each batch dispatch that
    fails with a TRANSIENT runtime fault (``_is_transient``: the
    measured worker crash/hang surface, XlaRuntimeError
    UNAVAILABLE/INTERNAL) is re-dispatched up to ``retries`` more
    times after a ``retry_wait``-second pause, resuming from the
    batch's own per-rung checkpoint when ``checkpoint_stem`` is set —
    a worker crash then costs one batch retry instead of the whole
    call (the round-4 batch bisection proved the ≤4 batch guard alone
    cannot guarantee worker survival; the ladder-level protection is
    retry+resume, as ``bench.py`` already does process-level).
    Programming errors re-raise immediately.

    ``spec``/``solver``/``rung_solver``: same fused-solver gate as
    :func:`phase1` (at the POLISH dtype — f64 polish naturally pins
    the generic loop; an f32 polish in the win envelope rides the
    fused kernel).
    """
    src = np.asarray(src)
    if picks is None:
        picks = np.arange(src.shape[0])
    picks = [int(k) for k in np.asarray(picks).ravel()]
    src_p = src[picks]
    if anchored_n_params:
        src_p = strip_anchors(src_p, anchored_n_params)
    K = len(picks)
    if batch is None:
        batch = safe_polish_batch()
    pbatch = int(batch) if batch and batch > 0 else K
    rung_solver = _maybe_rung_solver(spec, rf0, opts, solver,
                                     rung_solver, lower, upper,
                                     np.dtype(dtype))
    XP_parts, A_parts = [], []
    for bi in range(0, K, pbatch):
        sel = list(range(bi, min(bi + pbatch, K)))
        ck = None
        if checkpoint_stem:
            ck = checkpoint_stem + ("_pol_ckpt.npz" if bi == 0
                                    else f"_pol{bi}_ckpt.npz")
        if verbose and K > pbatch:
            print(f"[workflow] polish batch [{sel[0]}:{sel[-1] + 1}] "
                  f"of {K}")
        bmeta = dict(meta or {})
        bmeta["picks"] = np.asarray([picks[j] for j in sel])
        for attempt in range(int(retries) + 1):
            try:
                res = _dispatch(
                    action, parts, jnp.asarray(src_p[sel].astype(dtype)),
                    betas, rf0, alpha, ckpt_path=ck,
                    save_every=max(int(save_every), 1), lower=lower,
                    upper=upper, opts=opts, store_paths=False,
                    batched=True, repeats=repeats, meta=bmeta,
                    verbose=verbose, rf_min=rf_min, rf_max=rf_max,
                    rung_solver=rung_solver)
                break
            except Exception as e:
                if attempt >= int(retries) or not _is_transient(e):
                    raise
                if verbose:
                    print(f"[workflow] polish batch [{sel[0]}:"
                          f"{sel[-1] + 1}] transient fault "
                          f"({type(e).__name__}); retry "
                          f"{attempt + 1}/{retries} in {retry_wait:g}s"
                          f"{' (resume from ' + ck + ')' if ck else ''}",
                          flush=True)
                time.sleep(retry_wait)
        XP_parts.append(np.asarray(res.XP))
        A_parts.append(np.asarray(res.A))
    XP = np.concatenate(XP_parts, axis=0)
    A = np.concatenate(A_parts, axis=0)
    return PolishResult(XP=XP, A=A, picks=np.asarray(picks),
                        order=np.argsort(A[:, -1]))


class EstimateResult(NamedTuple):
    phase1: Phase1Result
    polish: Optional[PolishResult]
    best: np.ndarray        # polished (or phase-1) winner, anchors
    #                         stripped — the final estimate vector
    best_A: float
    best_member: int        # index into the phase-1 ensemble


def estimate(make_problem, xp0, betas, rf0, alpha, *, n_params: int,
             opts: Optional[LBFGSOptions] = None,
             anchor_weight: float = 0.0, anchor_width: float = 0.25,
             repeats: int = 1, snapshot_beta: Optional[int] = None,
             polish_top: int = 4, polish_batch: Optional[int] = None,
             polish_opts: Optional[LBFGSOptions] = None,
             polish_repeats: int = 1, polish_extra_betas: int = 10,
             polish_dtype=np.float64,
             checkpoint_stem: Optional[str] = None, save_every: int = 2,
             rf_min=None, rf_max=None, meta: Optional[dict] = None,
             solver: str = "auto", polish_retries: int = 2,
             verbose: bool = False) -> EstimateResult:
    """The full staged recipe in one call: prior-box ensemble →
    own-draw anchors → chunked f32 screening ladder (+ snapshot) →
    action ranking → strip anchors → batch-split f64 polish of the top
    members.

    ``make_problem(dtype) -> (action, parts, lower, upper)`` builds the
    (possibly multi-protocol) annealing problem at a given dtype — the
    same problem must be built at the screening dtype (``xp0.dtype``)
    and the polish dtype. It may instead return a 5-tuple
    ``(action, parts, lower, upper, spec)`` — the trailing
    ``ProblemSpec`` then feeds the shared fused-solver gate (``solver``
    kwarg, default 'auto': the screen/polish ride the whole-solve
    Pallas kernel wherever the facade would — VERDICT r4 #3; anchored
    screens and f64 polishes pin the generic loop automatically). ``xp0``: (B, n) ensemble whose trailing
    ``n_params`` coordinates are the estimated parameters (e.g. drawn
    from ``models.nakl_param_boxes`` boxes). ``snapshot_beta``: rung
    index whose state seeds the polish (default: polish from the final
    state). ``polish_top=0`` skips the polish stage entirely.

    See ``examples/nakl_ensemble.py`` for the flagship 18-parameter
    NaKL driver built on this, and PARITY.md's round-3 campaign
    sections for every measured design decision above.
    """
    xp0 = np.asarray(xp0)
    p1_dtype = xp0.dtype

    def _build(dt):
        out = make_problem(dt)
        return out if len(out) == 5 else tuple(out) + (None,)

    action, parts, lower, upper, spec = _build(p1_dtype)
    r1 = phase1(action, parts, xp0, betas, rf0, alpha, lower=lower,
                upper=upper, opts=opts, n_params=n_params,
                anchor_weight=anchor_weight, anchor_width=anchor_width,
                repeats=repeats, snapshot_beta=snapshot_beta,
                checkpoint_stem=checkpoint_stem, save_every=save_every,
                rf_min=rf_min, rf_max=rf_max, meta=meta,
                spec=spec, solver=solver, verbose=verbose)
    nap = n_params if r1.anchored else 0
    if not polish_top:
        b = int(r1.order[0])
        best = r1.XP[b]
        if nap:
            best = strip_anchors(best, nap)
        return EstimateResult(phase1=r1, polish=None, best=best,
                              best_A=float(r1.A[b, -1]), best_member=b)
    betas = np.asarray(betas, np.float64)
    n_beta = len(betas)
    if r1.snapshot is not None:
        # rank at the snapshot rung; polish climbs snap..top+extra
        c = min(int(snapshot_beta) - 1, r1.A.shape[1] - 1)
        order_pol = np.argsort(r1.A[:, c])
        src = r1.snapshot
        lo_rung = int(snapshot_beta)
    else:
        order_pol = r1.order
        src = r1.XP
        lo_rung = max(n_beta - 21, 0)
    picks = order_pol[: min(int(polish_top), src.shape[0])]
    # continue the ladder in BETA-VALUE space: resume at the source
    # state's rung VALUE and extrapolate the extra rungs at the
    # ladder's own spacing (betas need not be arange(n_beta) — rung
    # indices and beta values only coincide for unit-spaced 0-based
    # ladders)
    step = float(betas[-1] - betas[-2]) if n_beta > 1 else 1.0
    extra = betas[-1] + step * np.arange(1, int(polish_extra_betas) + 1)
    pol_betas = np.concatenate([betas[lo_rung:], extra])
    action64, parts64, lo64, hi64, spec64 = _build(polish_dtype)
    rf0_64 = np.asarray(rf0, polish_dtype)
    r2 = polish(action64, parts64, src, pol_betas, rf0_64, alpha,
                lower=lo64, upper=hi64, opts=polish_opts, picks=picks,
                anchored_n_params=nap, batch=polish_batch,
                repeats=polish_repeats, checkpoint_stem=checkpoint_stem,
                save_every=save_every, rf_min=rf_min, rf_max=rf_max,
                dtype=polish_dtype, spec=spec64, solver=solver,
                retries=polish_retries, verbose=verbose)
    j = int(r2.order[0])
    return EstimateResult(phase1=r1, polish=r2, best=r2.XP[j],
                          best_A=float(r2.A[j, -1]),
                          best_member=int(r2.picks[j]))
