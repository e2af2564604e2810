"""Matrix-free Levenberg–Marquardt / Gauss–Newton inner solver.

The VA action is a weighted sum of squares, so beyond the reference's
quasi-Newton-only world (SciPy L-BFGS-B) a Gauss–Newton path is natural
(BASELINE north star: "jax.jacfwd + Gauss-Newton Jacobians" as the
second-order option). At large β the FE term dominates and the action is
stiff — L-BFGS crawls while GN curvature is nearly exact there.

Design (device-side, one ``lax.while_loop``):

- the problem is given as a residual function ``r(z) -> (n_res,)`` with
  A(z) = ||r(z)||²; weights/normalizations are folded into r;
- the Jacobian is never materialized: GN matvecs (JᵀJ + λI)v run as one
  ``jvp`` + one ``vjp`` per CG iteration (the banded stencil structure makes
  these as cheap as two action evaluations);
- damped step from ``cg_iters`` conjugate-gradient iterations; classic LM
  trust-region λ update on the gain ratio;
- termination mirrors the L-BFGS solver: pgtol on ∞-norm of the gradient,
  ftol on relative decrease, maxiter;
- box bounds via projection of the trial point (projected-gradient
  termination) — GN steps near bounds degrade gracefully to damped
  gradient steps as λ grows.

Returns the same result tuple as ``lbfgs_minimize`` so the annealing ladder
can swap inner solvers (``run_ladder(..., inner='lm')``).
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from varanneal_tpu.opt.lbfgs import LBFGSResult, CONV_GRAD, CONV_FTOL, \
    MAXITER, LS_FAIL


@dataclasses.dataclass(frozen=True)
class LMOptions:
    maxiter: int = 100
    cg_iters: int = 20
    lam0: float = 1e-3
    lam_min: float = 1e-12
    lam_max: float = 1e12
    ftol: float = 2.220446049250313e-09
    pgtol: float = 1e-5


class _LMState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    A: jnp.ndarray
    g: jnp.ndarray          # gradient of A = 2 Jᵀ r
    lam: jnp.ndarray
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def _cg(matvec, b, iters):
    """Fixed-iteration CG for SPD matvec; returns approximate solve."""
    x0 = jnp.zeros_like(b)

    def body(_, carry):
        x, r, p, rs = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-300), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-300)
        p = r + beta * p
        return x, r, p, rs_new

    r0 = b
    out = lax.fori_loop(0, iters, body, (x0, r0, r0, jnp.vdot(r0, r0)))
    return out[0]


def lm_minimize(residual_fn, x0, *, lower=None, upper=None,
                opts: Optional[LMOptions] = None) -> LBFGSResult:
    """Minimize ||residual_fn(x)||² from x0 (flat vector)."""
    opts = opts or LMOptions()
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    lo = (jnp.full_like(x0, -big) if lower is None
          else jnp.broadcast_to(jnp.asarray(lower, dtype), x0.shape))
    hi = (jnp.full_like(x0, big) if upper is None
          else jnp.broadcast_to(jnp.asarray(upper, dtype), x0.shape))

    def proj(x):
        return jnp.clip(x, lo, hi)

    def pgnorm(x, g):
        return jnp.max(jnp.abs(x - proj(x - g)))

    x0 = proj(x0)
    r0 = residual_fn(x0)
    A0 = jnp.vdot(r0, r0)

    def grad_at(x, r):
        _, vjp = jax.vjp(residual_fn, x)
        return 2.0 * vjp(r)[0]

    g0 = grad_at(x0, r0)
    init = _LMState(
        x=x0, r=r0, A=A0, g=g0,
        lam=jnp.asarray(opts.lam0, dtype),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pgnorm(x0, g0) <= opts.pgtol, CONV_GRAD,
                         MAXITER).astype(jnp.int32),
        done=pgnorm(x0, g0) <= opts.pgtol)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        def matvec(v):
            _, Jv = jax.jvp(residual_fn, (s.x,), (v,))
            _, vjp = jax.vjp(residual_fn, s.x)
            return vjp(Jv)[0] + s.lam * v

        rhs = -0.5 * s.g                       # = -Jᵀ r
        delta = _cg(matvec, rhs, opts.cg_iters)
        x_t = proj(s.x + delta)
        r_t = residual_fn(x_t)
        A_t = jnp.vdot(r_t, r_t)

        # gain ratio: actual vs model reduction (model: λ||δ||² − δᵀg)
        pred = jnp.vdot(delta, s.lam * delta - 0.5 * s.g)
        rho = (s.A - A_t) / jnp.maximum(pred, 1e-300)
        good = (A_t < s.A) & jnp.isfinite(A_t)

        lam = jnp.where(
            good & (rho > 0.75), jnp.maximum(s.lam / 3.0, opts.lam_min),
            jnp.where(good, s.lam,
                      jnp.minimum(s.lam * 4.0, opts.lam_max)))
        x_n = jnp.where(good, x_t, s.x)
        r_n = jnp.where(good, r_t, s.r)
        A_n = jnp.where(good, A_t, s.A)
        g_n = jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), grad_at(x_n, r_n), s.g)

        pgn = pgnorm(x_n, g_n)
        df = s.A - A_n
        fden = jnp.maximum(jnp.maximum(jnp.abs(s.A), jnp.abs(A_n)), 1.0)
        conv_g = pgn <= opts.pgtol
        conv_f = good & (df <= opts.ftol * fden)
        stuck = (~good) & (s.lam >= opts.lam_max)
        done = conv_g | conv_f | stuck
        status = jnp.where(
            conv_g, CONV_GRAD,
            jnp.where(stuck, LS_FAIL,
                      jnp.where(conv_f, CONV_FTOL, MAXITER))).astype(
            jnp.int32)
        # nfev: residual eval + grad eval + cg (jvp+vjp each ~1 eval pair)
        return _LMState(x=x_n, r=r_n, A=A_n, g=g_n, lam=lam,
                        niter=s.niter + 1,
                        nfev=s.nfev + 2 + opts.cg_iters,
                        status=status, done=done)

    s = lax.while_loop(cond, body, init)
    return LBFGSResult(x=s.x, f=s.A, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=pgnorm(s.x, s.g))


def make_residual_fn(spec):
    """Weighted flat residual ``residual(XP, rf) -> (n_res,)`` for a
    ProblemSpec: A(XP, rf) = ||residual(XP, rf)||² equals the Gaussian
    action. Supports the full canonical R zoo: scalar, (N, K) diagonal, and
    (N, K, K) matrix precision — matrix R is folded in via its Cholesky
    factor (d·R·d = ||Cᵀd||² with R = C Cᵀ, so R must be SPD).
    """
    import numpy as np
    from varanneal_tpu.ops.action import unpack
    from varanneal_tpu.ops.disc import model_residuals

    RM = np.asarray(spec.RM)
    if RM.ndim == 3:
        # static: factor once on the host
        me_C = np.linalg.cholesky(RM / (spec.L * spec.N_data))
    else:
        me_w = np.sqrt(RM / (spec.L * spec.N_data))

    def _rows(C, d):
        """(Cᵀ d)_nl = Σ_k C[n,k,l] d[n,k] — per-time-row whitening."""
        return jnp.einsum("nkl,nk->nl", C, d)

    def residual(XP, rf_val):
        X, P = unpack(spec, XP)
        x_obs = X[:: spec.obs_stride][: spec.N_data,
                                      np.asarray(spec.Lidx, np.int32)]
        diff = x_obs - jnp.asarray(spec.Y, XP.dtype)
        if RM.ndim == 3:
            r_me = _rows(jnp.asarray(me_C, XP.dtype), diff).ravel()
        else:
            r_me = (jnp.asarray(me_w, XP.dtype) * diff).ravel()
        rf_val = jnp.asarray(rf_val, XP.dtype)
        norm = spec.D * (spec.N_f - 1)
        if rf_val.ndim == 3:
            # rf is traced (rf0·α^β): factor on device, batched over rows
            fe_C = jnp.linalg.cholesky(rf_val / norm)
        else:
            fe_w = jnp.sqrt(rf_val / norm)
        res = model_residuals(spec, X, P)
        if spec.disc == "SimpsonHermite":
            simpson, hermite = res
            M = (spec.N_f - 1) // 2
            if rf_val.ndim == 3:
                r_fe = jnp.concatenate(
                    [_rows(fe_C[: 2 * M: 2], simpson).ravel(),
                     _rows(fe_C[1: 2 * M: 2], hermite).ravel()])
            elif fe_w.ndim == 0:
                r_fe = jnp.concatenate([(fe_w * simpson).ravel(),
                                        (fe_w * hermite).ravel()])
            else:
                r_fe = jnp.concatenate(
                    [(fe_w[: 2 * M: 2] * simpson).ravel(),
                     (fe_w[1: 2 * M: 2] * hermite).ravel()])
        elif rf_val.ndim == 3:
            r_fe = _rows(fe_C, res).ravel()
        else:
            r_fe = (fe_w * res).ravel()
        return jnp.concatenate([r_me, r_fe])

    return residual
