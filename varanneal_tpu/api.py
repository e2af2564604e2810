"""Annealer facade — the reference-compatible public surface.

Mirrors ``varanneal/va_ode.py :: Annealer`` (set_model / set_data /
set_data_fromfile / anneal / save_paths / save_params /
save_action_errors — SURVEY.md §2), with the same kwarg vocabulary so
reference scripts port mechanically. Underneath, everything is the pure-JAX
machinery: one jitted ``lax.scan`` ladder per problem, not one ADOL-C tape
per β.

Compatibility notes (pinned decisions, reference mount empty):

- ``adolcID`` is accepted and ignored — there is no global tape registry to
  namespace; ensembles are vmapped instead (``parallel/ensemble.py``).
- ``method`` accepts 'L-BFGS-B' (device-side bounded L-BFGS, default),
  'TNC' (truncated Newton-CG with bound projection), 'LM'/'GN'
  (matrix-free Levenberg-Marquardt / Gauss-Newton) and 'CG'/'NCG'
  (nonlinear conjugate gradient, unbounded) — covering and exceeding the
  reference's secondary SciPy methods [M].
- exit flags are mapped to SciPy-like codes: 0 converged (pgtol or ftol),
  1 maxiter exhausted, 2 line-search failure.
"""

import time
import warnings
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from varanneal_tpu.ops.spec import build_spec, canonical_R, _insert_midpoints
from varanneal_tpu.ops.action import make_action, pack
from varanneal_tpu.opt.lbfgs import LBFGSOptions
from varanneal_tpu.anneal.ladder import run_ladder
from varanneal_tpu import io as vio

_STATUS_TO_SCIPY = np.array([0, 0, 1, 2])  # CONV_GRAD/CONV_FTOL/MAXITER/LS_FAIL


def _default_dtype():
    return np.float64 if jax.config.jax_enable_x64 else np.float32


def make_lbfgs_options(opt_args: Optional[dict],
                       dtype=np.float64) -> LBFGSOptions:
    """Map a reference-style ``opt_args`` dict (SciPy minimize options) onto
    LBFGSOptions. Accepts maxiter, maxcor/m, maxls, gtol/pgtol, ftol, factr.

    When running in float32, the f64-calibrated default tolerances are
    unresolvable (the solver would stop on round-off immediately), so
    unspecified ftol/pgtol get f32 floors (1e-6 / 1e-4).
    """
    opt_args = dict(opt_args or {})
    kw = {}
    if np.dtype(dtype) == np.float32:
        kw["ftol"] = 1e-6
        kw["pgtol"] = 1e-4
    if "maxiter" in opt_args:
        kw["maxiter"] = int(opt_args.pop("maxiter"))
    if "maxcor" in opt_args:
        kw["m"] = int(opt_args.pop("maxcor"))
    if "m" in opt_args:
        kw["m"] = int(opt_args.pop("m"))
    if "maxls" in opt_args:
        kw["maxls"] = int(opt_args.pop("maxls"))
    if "gtol" in opt_args:
        kw["pgtol"] = float(opt_args.pop("gtol"))
    if "pgtol" in opt_args:
        kw["pgtol"] = float(opt_args.pop("pgtol"))
    if "factr" in opt_args:
        kw["ftol"] = float(opt_args.pop("factr")) * np.finfo(np.float64).eps
    if "ftol" in opt_args:
        kw["ftol"] = float(opt_args.pop("ftol"))
    if "direction" in opt_args:
        kw["direction"] = str(opt_args.pop("direction"))
    if "bounded_algo" in opt_args:
        kw["bounded_algo"] = str(opt_args.pop("bounded_algo"))
    opt_args.pop("maxfun", None)   # accepted, unused (nfev tracked per solve)
    opt_args.pop("disp", None)
    if opt_args:
        raise ValueError(f"unsupported opt_args: {sorted(opt_args)}")
    return LBFGSOptions(**kw)


def build_bounds(spec, bounds, dtype):
    """Replicate per-variable bounds over every time index (reference bounds
    semantics, SURVEY.md §2): ``bounds`` is a list of D (lo, hi) pairs for
    the state variables followed by NPest pairs for the estimated
    parameters. Returns flat (lower, upper) arrays or (None, None).
    """
    if bounds is None:
        return None, None
    bounds = list(bounds)
    if len(bounds) != spec.D + spec.NPest:
        raise ValueError(
            f"bounds must have D + NPest = {spec.D + spec.NPest} entries, "
            f"got {len(bounds)}")
    inf = np.inf
    lo = np.array([(-inf if b[0] is None else b[0]) for b in bounds], dtype)
    hi = np.array([(inf if b[1] is None else b[1]) for b in bounds], dtype)
    lower = np.tile(lo[: spec.D], spec.N_f)
    upper = np.tile(hi[: spec.D], spec.N_f)
    if spec.NPest:
        rep = spec.N_f if spec.time_dep_p else 1
        lower = np.concatenate([lower, np.tile(lo[spec.D:], rep)])
        upper = np.concatenate([upper, np.tile(hi[spec.D:], rep)])
    # replace inf with finite sentinels handled inside lbfgs via clip of
    # huge values; jnp.clip with inf is fine, keep as-is.
    return lower, upper


class Annealer:
    """Variational annealing driver for ODE problems (reference-compatible).

    Usage matches the reference::

        ann = Annealer()
        ann.set_model(f, D)
        ann.set_data(data, t=t)                 # data: (N, L) observations
        ann.anneal(X0, P0, alpha, beta_array, RM, RF0, Lidx, Pidx, ...)
        ann.save_paths("paths.npy")
    """

    def __init__(self):
        self.f = None
        self.D = None
        self.data = None
        self.t_data = None
        self.stim = None
        self.annealing_run = False

    # ------------------------------------------------------------------
    def set_model(self, f, D):
        """Store the vector field f(t, x, p) (vectorized over time) and the
        state dimension D."""
        self.f = f
        self.D = int(D)

    def set_data(self, data, stim=None, t=None, nstart=0, N=None):
        """Window and store the observation series.

        ``data``: (N_total, L) observed values; ``t``: (N_total,) times
        (required); ``stim``: optional (N_total,) or (N_total, S) stimulus;
        ``nstart``/``N``: window selection (reference semantics)."""
        data = np.asarray(data, dtype=np.float64)
        if data.ndim == 1:
            data = data[:, None]
        if t is None:
            raise ValueError("set_data requires t (time array)")
        t = np.asarray(t, dtype=np.float64)
        N = data.shape[0] - nstart if N is None else int(N)
        sl = slice(nstart, nstart + N)
        self.data = data[sl]
        self.t_data = t[sl]
        if stim is not None:
            stim = np.asarray(stim, dtype=np.float64)
            if stim.ndim == 1:
                stim = stim[:, None]
            self.stim = stim[sl]
        else:
            self.stim = None

    def set_data_fromfile(self, data_file, stim_file=None, nstart=0, N=None):
        """Load data from file; column 0 is time, remaining columns are the
        observed variables (reference convention [M])."""
        raw = vio.load_data(data_file)
        stim = None
        if stim_file is not None:
            sraw = vio.load_data(stim_file)
            stim = sraw[:, 1:] if sraw.ndim == 2 else sraw
        self.set_data(raw[:, 1:], stim=stim, t=raw[:, 0], nstart=nstart, N=N)

    # ------------------------------------------------------------------
    def anneal(self, X0, P0, alpha, beta_array, RM, RF0, Lidx, Pidx=None,
               dt_model=None, init_to_data=True, action="A_gaussian",
               disc="trapezoid", method="L-BFGS-B", bounds=None,
               opt_args=None, adolcID=0, dtype=None, track_paths=True,
               verbose=False, checkpoint_path=None, checkpoint_every=10,
               resume=True, R_time_dependent=None, engine="auto",
               repeats=1, snapshot_beta=None, checkpoint_meta=None,
               compensated=False, RF_max=None, RF_min=None,
               solver="auto"):
        """Run the full precision-annealing ladder.

        Signature mirrors the reference (``varanneal/va_ode.py ::
        Annealer.anneal`` [M, SURVEY.md §2]). Extra TPU-native kwargs:
        ``dtype`` (default f64 when x64 is on), ``track_paths`` (store all
        per-β minimizers; disable for huge problems), ``verbose``;
        ``checkpoint_path``/``checkpoint_every``/``resume``: per-chunk
        checkpointing of the ladder to an .npz (see anneal/checkpoint.py);
        ``R_time_dependent``: disambiguates 2-D RM/RF0 when the time and
        component dimensions coincide (True = (N, K) per-time diagonal,
        False = (K, K) matrix; default warns and reads time-dependent);
        ``engine``: ``'auto'`` (default — each Pallas engine in its
        measured-win regime: the whole-problem fused action+grad kernel
        for D>=256 one-step discs in f32 on an accelerator, 5.7x XLA at
        the D=400 sweep config; XLA otherwise), ``'xla'``, ``'pallas'``
        (blocked FE kernel, forced), or ``'ag'`` (whole-problem fused
        action+grad kernel, forced — kernels/ag_pallas.py);
        ``repeats``: re-minimize every β rung this many times (warm-
        started, one bounded dispatch each — deep per-rung solves under
        this testbed's ~60 s dispatch cap; records stay per-rung);
        ``snapshot_beta``: record the decision state right after this many
        rungs (stored as ``self.XP_snapshot`` — the f64-polish restart
        point, PARITY.md two-phase recipe); ``checkpoint_meta``: dict of
        run-identity scalars validated on checkpoint resume;
        ``compensated``: accumulate the ME/FE quadratic sums with the
        two-float exact-sum tree (``ops.action.comp_sum`` — removes f32
        reduction noise; measured basin-depth effect in PARITY.md;
        forces the XLA engine);
        ``RF_max``/``RF_min``: per-component cap / floor on the annealed
        precision, RF(β) = max(min(RF0·α^β, RF_max), RF_min) — both
        accept the same shape zoo as RF0 (+inf cap / 0 floor = anneal
        normally). A capped component stops annealing at its cap; a
        floored component starts the ladder AT its floor and resumes
        annealing once RF0·α^β overtakes it (see anneal/ladder.py);
        ``solver``: ``'auto'`` (default — the whole-solve Pallas kernel
        in its measured-win envelope: TPU, unbounded f32 L-BFGS
        problems inside the kernel's VMEM budget and with the default
        ``engine`` policy, 4.2–10x the generic loop at matched eval
        counts, PARITY.md; the generic while_loop family elsewhere),
        ``'generic'`` (forced while_loop L-BFGS family), or ``'fused'``
        (the whole-solve kernel forced: the entire inner solve in ONE
        launch per rung, kernels/solve_pallas.py — warns and falls back
        where unsupported).
        """
        if self.f is None or self.data is None:
            raise RuntimeError("call set_model and set_data before anneal")
        if action != "A_gaussian":
            raise ValueError("only action='A_gaussian' is supported")
        if method not in ("L-BFGS-B", "LBFGS", "LM", "GN", "CG", "NCG",
                          "TNC"):
            raise ValueError(f"unsupported method {method!r}")
        del adolcID  # no tape registry; kept for signature compatibility
        dtype = dtype or _default_dtype()

        P0 = np.asarray(P0, dtype=np.float64)
        spec = build_spec(
            self.f, self.D, self.data, self.t_data, Lidx, RM, disc=disc,
            P=P0, pidx=Pidx, stim=self.stim, dt_model=dt_model,
            R_time_dependent=R_time_dependent)
        self.spec = spec

        # ---- initial path on the model grid --------------------------
        X0 = np.array(X0, dtype=np.float64, copy=True)
        nskip = spec.obs_stride if disc != "SimpsonHermite" else (
            spec.obs_stride // 2)
        N_base = (spec.N_data - 1) * nskip + 1
        if X0.shape == (spec.N_data, spec.D) and N_base != spec.N_data:
            from varanneal_tpu.ops.spec import _interp_grid
            X0 = _interp_grid(X0, N_base)
        if X0.shape != (N_base, spec.D):
            raise ValueError(
                f"X0 must have shape ({spec.N_data},{spec.D}) or "
                f"({N_base},{spec.D}), got {X0.shape}")
        if init_to_data:
            X0[::nskip, np.asarray(spec.Lidx)] = spec.Y
        if disc == "SimpsonHermite":
            X0 = _insert_midpoints(X0)

        XP0 = np.asarray(pack(spec, jnp.asarray(X0)), dtype=dtype)

        rf0 = canonical_R(RF0, spec.N_f - 1, spec.D, "RF0",
                          time_dependent=R_time_dependent).astype(dtype)
        rf_max = None
        if RF_max is not None:
            rf_max = canonical_R(
                RF_max, spec.N_f - 1, spec.D, "RF_max",
                time_dependent=R_time_dependent).astype(dtype)
        rf_min = None
        if RF_min is not None:
            rf_min = canonical_R(
                RF_min, spec.N_f - 1, spec.D, "RF_min",
                time_dependent=R_time_dependent).astype(dtype)
        lower, upper = build_bounds(spec, bounds, dtype)
        opt_args = dict(opt_args or {})
        cg_iters = opt_args.pop("cg_iters", None)  # LM/TNC inner-CG depth
        opts = make_lbfgs_options(opt_args, dtype)
        betas = np.asarray(beta_array, dtype=dtype)

        if compensated:
            if engine == "pallas":
                raise ValueError(
                    "compensated=True is implemented on the XLA engine "
                    "and the whole-problem 'ag' kernel (round-5 "
                    "in-kernel two-float reductions), not the blocked "
                    "FE kernel")
            from varanneal_tpu.kernels.ag_pallas import (ag_supported,
                                                         make_action_ag)
            if engine == "ag":
                # round-5 (VERDICT r4 #5): compensated accumulation
                # in-kernel — the two-float shift/roll butterfly
                # reductions give the fused eval path the XLA
                # compensated action's f64-scalar contract
                if not ag_supported(spec, rf0, dtype):
                    raise ValueError(
                        "engine='ag' unsupported for this problem "
                        "(disc/rf/RM shape/time-dep params/VMEM); the "
                        "compensated XLA engine (engine='auto') serves "
                        "it")
                act, parts = make_action_ag(spec, compensated=True)
                act.engine = "ag"
            else:
                act, parts = make_action(spec, compensated=True)
                act.engine = "xla"
        else:
            from varanneal_tpu.kernels.fe_pallas import select_action
            act, parts = select_action(spec, rf0, engine=engine,
                                       dtype=dtype)
        inner, residual_fn, lm_opts, tnc_opts = "lbfgs", None, None, None
        if method in ("LM", "GN"):
            from varanneal_tpu.opt.lm import make_residual_fn, LMOptions
            inner = "lm"
            residual_fn = make_residual_fn(spec)
            lm_kw = {} if cg_iters is None else dict(cg_iters=int(cg_iters))
            lm_opts = LMOptions(maxiter=opts.maxiter,
                                ftol=opts.ftol, pgtol=opts.pgtol, **lm_kw)
        elif method in ("CG", "NCG"):
            inner = "ncg"
        elif method == "TNC":
            from varanneal_tpu.opt.tnc import TNCOptions
            inner = "tnc"
            tnc_kw = {} if cg_iters is None else dict(cg_iters=int(cg_iters))
            tnc_opts = TNCOptions(maxiter=opts.maxiter, ftol=opts.ftol,
                                  pgtol=opts.pgtol, maxls=opts.maxls,
                                  **tnc_kw)

        # solver='auto'/'fused'/'generic' gate — shared with the staged
        # workflow (kernels.solve_pallas.pick_rung_solver) so the two
        # entry points can never drift
        from varanneal_tpu.kernels.solve_pallas import pick_rung_solver
        rung_solver = pick_rung_solver(
            spec, rf0, opts, solver=solver, lower=lower, upper=upper,
            dtype=dtype, compensated=compensated, engine=engine,
            method=method)

        t0 = time.time()
        repeats = max(1, int(repeats))
        if (checkpoint_path is not None or repeats > 1
                or snapshot_beta is not None):
            from varanneal_tpu.anneal.checkpoint import \
                run_ladder_checkpointed
            res = run_ladder_checkpointed(
                act, parts, jnp.asarray(XP0), betas, rf0, float(alpha),
                ckpt_path=checkpoint_path, save_every=checkpoint_every,
                lower=lower, upper=upper, opts=opts,
                store_paths=track_paths, resume=resume, verbose=verbose,
                repeats=repeats, snapshot_beta=snapshot_beta,
                meta=checkpoint_meta,
                inner=inner, residual_fn=residual_fn, lm_opts=lm_opts,
                tnc_opts=tnc_opts, rf_max=rf_max, rf_min=rf_min,
                rung_solver=rung_solver)
        else:
            @jax.jit
            def _ladder(XP0, betas):
                return run_ladder(act, parts, XP0, betas, rf0, float(alpha),
                                  lower=lower, upper=upper, opts=opts,
                                  store_paths=track_paths, inner=inner,
                                  residual_fn=residual_fn, lm_opts=lm_opts,
                                  tnc_opts=tnc_opts, rf_max=rf_max,
                                  rf_min=rf_min, rung_solver=rung_solver)

            res = _ladder(jnp.asarray(XP0), jnp.asarray(betas))
        res = jax.tree_util.tree_map(np.asarray, res)
        t1 = time.time()
        if verbose:
            tot_nfev = int(res.nfev.sum())
            print(f"[varanneal_tpu] ladder of {len(betas)} beta steps: "
                  f"{t1 - t0:.3f} s wall (incl. compile on first call), "
                  f"{tot_nfev} action+grad evals")

        # ---- store results (reference attribute names) ----------------
        self.beta_array = np.asarray(beta_array)
        self.alpha = float(alpha)
        self.A_array = res.A
        self.me_array = res.ME
        self.fe_array = res.FE
        self.exitflags = _STATUS_TO_SCIPY[res.status]
        self.niter_array = res.niter
        self.nfev_array = res.nfev
        self.pgnorm_array = res.pgnorm
        self.XP_final = res.XP
        self.XP_snapshot = getattr(res, "snapshot", None)
        if track_paths:
            self.minpaths = res.paths
        else:
            self.minpaths = res.XP[None, :]
        self.annealing_run = True
        self.anneal_wall_s = t1 - t0
        return res

    # ------------------------------------------------------------------
    def _check_run(self):
        if not self.annealing_run:
            raise RuntimeError("run anneal() first")

    @property
    def minpaths_X(self):
        self._check_run()
        spec = self.spec
        return self.minpaths[:, : spec.n_state].reshape(
            -1, spec.N_f, spec.D)

    @property
    def minpaths_P(self):
        self._check_run()
        spec = self.spec
        if not spec.NPest:
            return np.zeros((self.minpaths.shape[0], 0))
        pest = self.minpaths[:, spec.n_state:]
        if spec.time_dep_p:
            return pest.reshape(-1, spec.N_f, spec.NPest)
        return pest

    def save_paths(self, filename):
        self._check_run()
        return vio.save_paths(filename, self.minpaths_X,
                              np.asarray(self.spec.t_f))

    def save_params(self, filename):
        self._check_run()
        return vio.save_params(filename, self.minpaths_P,
                               np.asarray(self.spec.t_f))

    def save_action_errors(self, filename):
        self._check_run()
        return vio.save_action_errors(
            filename, self.beta_array, self.A_array, self.me_array,
            self.fe_array)
