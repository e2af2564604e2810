"""Nonlinear conjugate gradient (Polak–Ribière+ with automatic restarts).

The reference exposes SciPy CG/TNC as secondary ``method=`` options
(``varanneal/_autodiffmin.py :: ADmin.min_cg_scipy`` [M, SURVEY.md §2]);
this is the device-side equivalent, sharing the strong-Wolfe line search
with the L-BFGS solver. Unbounded only (CG has no natural box-constraint
story — use L-BFGS-B semantics or LM for bounded problems).
"""

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import lax, tree_util as jtu

from varanneal_tpu.opt.lbfgs import (
    LBFGSResult, LBFGSOptions, _wolfe_line_search, _tdot, _tmap,
    _tmax_abs, _axpy, _scale, _where_s, _treduce,
    CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL)


@dataclasses.dataclass(frozen=True)
class NCGOptions:
    maxiter: int = 1000
    ftol: float = 2.220446049250313e-09
    pgtol: float = 1e-5
    maxls: int = 30
    c1: float = 1e-4
    c2: float = 0.4          # CG wants a stricter curvature condition


class _State(NamedTuple):
    x: object
    f: jnp.ndarray
    g: object
    d: object                # current search direction
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def ncg_minimize(value_and_grad, x0, *,
                 opts: Optional[NCGOptions] = None) -> LBFGSResult:
    """Minimize f given ``value_and_grad(x) -> (f, g)`` with PR+ NCG."""
    opts = opts or NCGOptions()
    ls_opts = LBFGSOptions(maxls=opts.maxls, c1=opts.c1, c2=opts.c2)
    x0 = _tmap(jnp.asarray, x0)
    dtype = jtu.tree_leaves(x0)[0].dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    f0, g0 = value_and_grad(x0)
    pg0 = _tmax_abs(g0)
    init = _State(
        x=x0, f=f0, g=g0, d=_scale(-1.0, g0),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pg0 <= opts.pgtol, CONV_GRAD, MAXITER).astype(
            jnp.int32),
        done=pg0 <= opts.pgtol)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        gd = _tdot(s.g, s.d)
        # restart on non-descent
        d = _where_s((gd >= 0) | ~jnp.isfinite(gd), _scale(-1.0, s.g), s.d)
        gnorm1 = _treduce(lambda acc, l: acc + jnp.sum(jnp.abs(l)),
                          s.g, jnp.zeros((), dtype))
        a_init = jnp.where(
            s.niter == 0,
            jnp.minimum(jnp.asarray(1.0, dtype),
                        1.0 / jnp.maximum(gnorm1, 1e-300)),
            jnp.asarray(1.0, dtype))
        a, f_new, g_new, ls_nfev, ls_ok = _wolfe_line_search(
            value_and_grad, s.x, d, s.f, s.g, a_init, big, ls_opts)
        x_new = _axpy(a, d, s.x)

        # Polak–Ribière+ beta with the automatic restart max(., 0)
        gg = _tdot(s.g, s.g)
        y = _tmap(lambda a_, b_: a_ - b_, g_new, s.g)
        beta = jnp.maximum(_tdot(g_new, y) / jnp.maximum(gg, 1e-300), 0.0)
        d_new = _axpy(beta, d, _scale(-1.0, g_new))

        pgn = _tmax_abs(g_new)
        df = s.f - f_new
        fden = jnp.maximum(jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0)
        conv_g = pgn <= opts.pgtol
        conv_f = df <= opts.ftol * fden
        fail = ~ls_ok
        done = conv_g | conv_f | fail
        status = jnp.where(
            conv_g, CONV_GRAD,
            jnp.where(fail, LS_FAIL,
                      jnp.where(conv_f, CONV_FTOL, MAXITER))).astype(
            jnp.int32)
        return _State(
            x=_where_s(fail, s.x, x_new),
            f=jnp.where(fail, s.f, f_new),
            g=_where_s(fail, s.g, g_new),
            d=d_new, niter=s.niter + 1, nfev=s.nfev + ls_nfev,
            status=status, done=done)

    s = lax.while_loop(cond, body, init)
    return LBFGSResult(x=s.x, f=s.f, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=_tmax_abs(s.g))
