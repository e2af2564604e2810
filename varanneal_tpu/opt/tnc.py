"""Truncated-Newton (TNC) inner solver — device-side, bound-constrained.

The reference offers SciPy's TNC as a secondary minimizer
(``varanneal/_autodiffmin.py :: ADmin.min_tnc_scipy`` [M, SURVEY.md §2
"secondary methods"]). That is Nash's Newton-CG with active-set gradient
projection in C; this is the same algorithm rebuilt on JAX primitives:

- true Hessian-vector products, matrix-free, by forward-over-reverse AD
  (``jvp`` through the gradient) — one HVP costs ~2 action evaluations
  thanks to the banded stencil structure of the VA action;
- the Newton system H δ = −g is solved by conjugate gradients RESTRICTED
  to the free variables (bound-active components masked out), truncated on
  negative curvature (Steihaug) and on the Eisenstat–Walker forcing
  tolerance min(0.5, √‖g‖)·‖g‖;
- line search: projected-path Armijo backtracking when bounds are present
  (shared with the L-BFGS-B solver), strong-Wolfe zoom otherwise;
- termination mirrors the other inner solvers: ``pgtol`` on the max-norm
  of the projected gradient, ``ftol`` on relative decrease, ``maxiter``.

Pytree-native and data-branch-free: jit/vmap/scan-safe, so TNC slots into
the annealing ladder (``run_ladder(..., inner='tnc')``) and vmapped
ensembles exactly like L-BFGS.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from varanneal_tpu.opt.lbfgs import (
    LBFGSResult, LBFGSOptions, CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL,
    _tmap, _tdot, _tmax_abs, _axpy, _scale, _where_s, _project, _proj_grad,
    _wolfe_line_search, _projected_backtracking_ls)


@dataclasses.dataclass(frozen=True)
class TNCOptions:
    maxiter: int = 100          # outer Newton iterations
    cg_iters: int = 30          # max CG iterations per Newton solve
    ftol: float = 2.220446049250313e-09
    pgtol: float = 1e-5
    maxls: int = 30
    c1: float = 1e-4
    c2: float = 0.9


class _CGState(NamedTuple):
    z: object               # accumulated Newton step (pytree)
    r: object               # residual −g − Hz
    p: object               # search direction
    rs: jnp.ndarray         # r·r
    i: jnp.ndarray
    done: jnp.ndarray


def _truncated_cg(hvp, g_free, cg_iters, dtype):
    """CG on H z = −g_free over the free subspace, truncated on negative
    curvature (first-iteration negative curvature falls back to steepest
    descent). ``g_free`` must already be masked; ``hvp`` must mask its
    output the same way. Returns (direction, cg_iterations_used)."""
    b = _scale(-1.0, g_free)
    rs0 = _tdot(b, b)
    bnorm = jnp.sqrt(rs0)
    # Eisenstat–Walker forcing term: solve accuracy tightens as g -> 0
    tol2 = (jnp.minimum(jnp.asarray(0.5, dtype), jnp.sqrt(bnorm))
            * bnorm) ** 2
    z0 = _tmap(jnp.zeros_like, b)

    init = _CGState(z=z0, r=b, p=b, rs=rs0, i=jnp.zeros((), jnp.int32),
                    done=rs0 <= tol2)

    def cond(s):
        return ~s.done & (s.i < cg_iters)

    def body(s):
        Hp = hvp(s.p)
        curv = _tdot(s.p, Hp)
        neg = (curv <= 0) | ~jnp.isfinite(curv)
        alpha = s.rs / jnp.maximum(curv, jnp.asarray(1e-300, dtype))
        z_n = _axpy(alpha, s.p, s.z)
        r_n = _axpy(-alpha, Hp, s.r)
        rs_n = _tdot(r_n, r_n)
        beta = rs_n / jnp.maximum(s.rs, jnp.asarray(1e-300, dtype))
        p_n = _axpy(beta, r_n, s.p)
        # negative curvature: stop; keep current z, or steepest descent if
        # it is still zero (first iteration)
        z_keep = _where_s(s.i == 0, b, s.z)
        return _CGState(
            z=_where_s(neg, z_keep, z_n),
            r=_where_s(neg, s.r, r_n),
            p=_where_s(neg, s.p, p_n),
            rs=jnp.where(neg, s.rs, rs_n),
            i=s.i + 1,
            done=neg | (rs_n <= tol2))

    s = lax.while_loop(cond, body, init)
    return s.z, s.i


class _TNState(NamedTuple):
    x: object
    f: jnp.ndarray
    g: object
    use_sd: jnp.ndarray     # retry flag: force steepest descent after a
    #                         line-search failure on a Newton direction
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def tnc_minimize(value_and_grad, x0, *, lower=None, upper=None,
                 opts: Optional[TNCOptions] = None) -> LBFGSResult:
    """Minimize ``f`` given ``value_and_grad(x) -> (f, g)`` from ``x0``,
    optionally subject to box bounds. Same result contract as
    ``lbfgs_minimize``."""
    opts = opts or TNCOptions()
    x0 = _tmap(jnp.asarray, x0)
    leaves = jax.tree_util.tree_leaves(x0)
    dtype = leaves[0].dtype
    bounded = (lower is not None) or (upper is not None)  # static
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    lower = (_tmap(lambda l: jnp.full(l.shape, -big, dtype), x0)
             if lower is None
             else _tmap(lambda lo, l: jnp.broadcast_to(
                 jnp.asarray(lo, dtype), l.shape), lower, x0))
    upper = (_tmap(lambda l: jnp.full(l.shape, big, dtype), x0)
             if upper is None
             else _tmap(lambda hi, l: jnp.broadcast_to(
                 jnp.asarray(hi, dtype), l.shape), upper, x0))

    grad_fn = lambda z: value_and_grad(z)[1]  # noqa: E731

    x0 = _project(x0, lower, upper)
    f0, g0 = value_and_grad(x0)
    pg0 = _tmax_abs(_proj_grad(x0, g0, lower, upper))
    init = _TNState(
        x=x0, f=f0, g=g0, use_sd=jnp.zeros((), bool),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pg0 <= opts.pgtol, CONV_GRAD, MAXITER).astype(
            jnp.int32),
        done=pg0 <= opts.pgtol)

    ls_opts = LBFGSOptions(maxls=opts.maxls, c1=opts.c1, c2=opts.c2)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        # ---- active set & masked Newton direction -----------------------
        eps_b = jnp.asarray(1e-12, dtype)
        active = _tmap(
            lambda xi, gi, lo, hi: ((xi <= lo + eps_b) & (gi > 0))
            | ((xi >= hi - eps_b) & (gi < 0)),
            s.x, s.g, lower, upper)
        mask = _tmap(lambda a: ~a, active)
        g_free = _tmap(lambda mi, gi: jnp.where(mi, gi, 0.0), mask, s.g)

        def hvp(v):
            v_m = _tmap(lambda mi, vi: jnp.where(mi, vi, 0.0), mask, v)
            Hv = jax.jvp(grad_fn, (s.x,), (v_m,))[1]
            return _tmap(lambda mi, hi: jnp.where(mi, hi, 0.0), mask, Hv)

        d, cg_used = _truncated_cg(hvp, g_free, opts.cg_iters, dtype)
        descent = _tdot(s.g, d)
        bad_dir = (descent >= 0) | ~jnp.isfinite(descent) | s.use_sd
        d = _where_s(bad_dir, _scale(-1.0, g_free), d)

        # ---- line search (Newton step: unit initial trial) --------------
        a_init = jnp.asarray(1.0, dtype)
        if bounded:
            x_new, f_new, g_new, ls_nfev, ls_ok = \
                _projected_backtracking_ls(
                    value_and_grad, s.x, d, s.f, s.g, a_init, lower,
                    upper, ls_opts)
        else:
            a, f_new, g_new, ls_nfev, ls_ok = _wolfe_line_search(
                value_and_grad, s.x, d, s.f, s.g, a_init, big, ls_opts)
            x_new = _axpy(a, d, s.x)

        # ---- termination -------------------------------------------------
        pgn = _tmax_abs(_proj_grad(x_new, g_new, lower, upper))
        df = s.f - f_new
        fden = jnp.maximum(jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0)
        conv_g = pgn <= opts.pgtol
        # an ftol-sized decrease on a steepest-descent retry is still
        # convergence; on a Newton step it may just mean a loose CG solve
        conv_f = ls_ok & (df <= opts.ftol * fden)
        # line-search failure on a (possibly loose) Newton direction: retry
        # once from steepest descent before declaring failure
        fail = ~ls_ok & bad_dir
        retry = ~ls_ok & ~bad_dir
        done = conv_g | conv_f | fail
        status = jnp.where(
            conv_g, CONV_GRAD,
            jnp.where(fail, LS_FAIL,
                      jnp.where(conv_f, CONV_FTOL, MAXITER))).astype(
            jnp.int32)
        x_out = _where_s(~ls_ok, s.x, x_new)
        f_out = jnp.where(~ls_ok, s.f, f_new)
        g_out = _where_s(~ls_ok, s.g, g_new)
        # nfev: one HVP ~ one fwd+rev pair per CG iteration + line search
        return _TNState(x=x_out, f=f_out, g=g_out, use_sd=retry,
                        niter=s.niter + 1,
                        nfev=s.nfev + ls_nfev + cg_used,
                        status=status, done=done)

    s = lax.while_loop(cond, body, init)
    pgn = _tmax_abs(_proj_grad(s.x, s.g, lower, upper))
    return LBFGSResult(x=s.x, f=s.f, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=pgn)
