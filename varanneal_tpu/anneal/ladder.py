"""The precision-annealing β ladder, fused into one compiled program.

Reference protocol (``varanneal/va_ode.py :: Annealer.anneal /
anneal_step`` [H, SURVEY.md §3.1]): for each β in beta_array, minimize the
action at RF = RF0·α^β warm-started from the previous β's minimizer, and
record A/ME/FE, the optimizer exit flag, and the minimizing path.

TPU-native differences (the point of the rebuild):

- the β loop is a ``lax.scan`` whose carry is the warm-started decision
  vector — RF enters as a *traced* value, so there is ONE compile for the
  whole ladder instead of the reference's one ADOL-C re-tape per β;
- the inner solve is the device-side bounded L-BFGS (``opt/lbfgs.py``)
  under ``lax.while_loop``;
- a failed inner solve is recorded, not retried — annealing proceeds
  regardless, preserving the reference's exit-flag semantics (SURVEY.md §5
  "failure detection").

Per-member iteration/eval counters ride through the scan, giving the
BASELINE metric (action+grad evals/sec) for free.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from varanneal_tpu.opt.lbfgs import lbfgs_minimize, LBFGSOptions


class LadderResult(NamedTuple):
    XP: object              # final minimizer — flat (n_dof,) or pytree,
    #                         matching XP0's structure
    A: jnp.ndarray          # (Nbeta,) action at each β's minimizer
    ME: jnp.ndarray         # (Nbeta,)
    FE: jnp.ndarray         # (Nbeta,)
    status: jnp.ndarray     # (Nbeta,) raw L-BFGS status codes
    niter: jnp.ndarray      # (Nbeta,)
    nfev: jnp.ndarray       # (Nbeta,) action+grad evaluations
    pgnorm: jnp.ndarray     # (Nbeta,)
    paths: Optional[object]  # (Nbeta, ...) stacked minimizers, if stored
    snapshot: Optional[object] = None   # decision tree recorded after
    #                         ``snapshot_beta`` rungs (the f64-polish
    #                         restart point — anneal/checkpoint.py)


def aggregate_repeats(res: LadderResult, n_rung: int, repeats: int,
                      rec_ax: int = 0) -> LadderResult:
    """Collapse a per-dispatch ladder record (each rung re-minimized
    ``repeats`` times, warm-started — the bounded-dispatch deep-solve
    recipe, PARITY.md 'two-phase recipe') to per-rung records.

    A/ME/FE/status/pgnorm take the LAST repeat of each rung (the deepest
    solve at that rf); niter/nfev SUM over the rung's repeats; paths keep
    the last repeat's minimizer.
    """
    if repeats == 1:
        return res
    import numpy as np

    def _reshape(a):
        a = np.asarray(a)
        shp = a.shape[:rec_ax] + (n_rung, repeats) + a.shape[rec_ax + 1:]
        return a.reshape(shp)

    def _last(a):
        return _reshape(a).take(repeats - 1, axis=rec_ax + 1)

    def _sum(a):
        return _reshape(a).sum(axis=rec_ax + 1)

    paths = res.paths
    if paths is not None:
        paths = jax.tree_util.tree_map(_last, paths)
    return res._replace(
        A=_last(res.A), ME=_last(res.ME), FE=_last(res.FE),
        status=_last(res.status), pgnorm=_last(res.pgnorm),
        niter=_sum(res.niter), nfev=_sum(res.nfev), paths=paths)


def run_ladder(action, action_parts, XP0, betas, rf0, alpha, *,
               lower=None, upper=None, opts: Optional[LBFGSOptions] = None,
               store_paths: bool = True, inner: str = "lbfgs",
               residual_fn=None, lm_opts=None,
               tnc_opts=None, rf_max=None, rf_min=None,
               rung_solver=None) -> LadderResult:
    """Run the full annealing ladder from initial decision vector ``XP0``.

    ``betas``: (Nbeta,) exponents (int or float — cast to the action dtype);
    ``rf0``: scalar or canonical array RF0; ``alpha``: ladder base.
    ``store_paths=False`` drops the (Nbeta, n_dof) minimizer record — use for
    very large ensembles where that array would dominate HBM (SURVEY.md §7
    memory note).

    ``rf_max``: optional per-component (broadcastable against ``rf0``) CAP
    on the annealed precision: RF(β) = min(RF0·α^β, rf_max). Components at
    their cap stop annealing while the rest continue. Set a component's
    cap to +inf to anneal it normally.

    ``rf_min``: optional per-component FLOOR: RF(β) = max(RF0·α^β,
    rf_min). A floored component starts the ladder already at its floor
    and resumes annealing once RF0·α^β overtakes it — e.g. flooring the
    voltage-equation RF high enforces the (certain) current balance from
    β=0 while the (uncertain) kinetics constraints anneal from soft, yet
    the voltage equation still stiffens at the top of the ladder. Floors
    of 0 anneal normally. When both are given the cap is applied last.

    ``inner``: 'lbfgs' (default), 'lm' — the matrix-free Gauss–Newton /
    Levenberg–Marquardt solver (``opt/lm.py``, requires
    ``residual_fn(XP, rf)``) — 'tnc' (truncated Newton-CG with bound
    projection, ``opt/tnc.py``), or 'ncg' (nonlinear conjugate gradient,
    unbounded only).

    ``rung_solver``: optional ``solve(XP, rf) -> LBFGSResult`` replacing
    the inner minimizer entirely (e.g. the whole-solve Pallas kernel,
    ``kernels/solve_pallas.make_rung_solver`` — one launch per rung).
    Takes precedence over ``inner``.
    """
    opts = opts or LBFGSOptions()
    XP0 = jax.tree_util.tree_map(jnp.asarray, XP0)
    dtype = jax.tree_util.tree_leaves(XP0)[0].dtype
    betas = jnp.asarray(betas, dtype)
    rf0 = jnp.asarray(rf0, dtype)
    alpha = jnp.asarray(alpha, dtype)
    if rf_max is not None:
        rf_max = jnp.asarray(rf_max, dtype)
    if rf_min is not None:
        rf_min = jnp.asarray(rf_min, dtype)
    vag = jax.value_and_grad(action)
    if inner == "lm":
        if residual_fn is None:
            raise ValueError("inner='lm' requires residual_fn")
        from varanneal_tpu.opt.lm import lm_minimize, LMOptions
        lm_opts = lm_opts or LMOptions()
    elif inner == "ncg":
        if lower is not None or upper is not None:
            raise ValueError("inner='ncg' does not support bounds")
        from varanneal_tpu.opt.ncg import ncg_minimize, NCGOptions
        ncg_opts = NCGOptions(maxiter=opts.maxiter, ftol=opts.ftol,
                              pgtol=opts.pgtol, maxls=opts.maxls)
    elif inner == "tnc":
        from varanneal_tpu.opt.tnc import tnc_minimize, TNCOptions
        tnc_opts = tnc_opts or TNCOptions(maxiter=opts.maxiter,
                                          ftol=opts.ftol,
                                          pgtol=opts.pgtol,
                                          maxls=opts.maxls)
    elif inner != "lbfgs":
        raise ValueError(f"unknown inner solver {inner!r}")

    def step(XP, beta):
        rf = rf0 * alpha ** beta
        if rf_min is not None:
            rf = jnp.maximum(rf, rf_min)
        if rf_max is not None:
            rf = jnp.minimum(rf, rf_max)
        if rung_solver is not None:
            res = rung_solver(XP, rf)
        elif inner == "lm":
            res = lm_minimize(lambda z: residual_fn(z, rf), XP,
                              lower=lower, upper=upper, opts=lm_opts)
        elif inner == "ncg":
            res = ncg_minimize(lambda z: vag(z, rf), XP, opts=ncg_opts)
        elif inner == "tnc":
            res = tnc_minimize(lambda z: vag(z, rf), XP,
                               lower=lower, upper=upper, opts=tnc_opts)
        else:
            res = lbfgs_minimize(lambda z: vag(z, rf), XP,
                                 lower=lower, upper=upper, opts=opts)
        A, me, fe = action_parts(res.x, rf)
        rec = dict(A=A, ME=me, FE=fe, status=res.status, niter=res.niter,
                   nfev=res.nfev, pgnorm=res.pgnorm)
        if store_paths:
            rec["paths"] = res.x
        return res.x, rec

    XPf, recs = lax.scan(step, XP0, betas)
    return LadderResult(
        XP=XPf, A=recs["A"], ME=recs["ME"], FE=recs["FE"],
        status=recs["status"], niter=recs["niter"], nfev=recs["nfev"],
        pgnorm=recs["pgnorm"], paths=recs.get("paths"))
