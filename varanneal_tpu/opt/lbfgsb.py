"""L-BFGS-B with generalized-Cauchy-point + subspace minimization,
TPU-vectorized.

The reference's inner solver is SciPy's Fortran L-BFGS-B
(``varanneal/_autodiffmin.py :: ADmin.min_lbfgs_scipy`` [M, SURVEY.md §2]),
whose bound handling is Byrd–Lu–Nocedal–Zhu (1995): (1) walk the projected
steepest-descent path segment by segment to the generalized Cauchy point
(GCP), (2) minimize the quadratic model over the free variables from the
GCP (direct primal method), (3) strong-Wolfe line search toward that point.
``opt/lbfgs.py`` ships only projection semantics (SURVEY.md §7 hard-part
#1); this module adds the real thing.

TPU-first redesign of step (1): the Fortran code walks breakpoints
SEQUENTIALLY, updating the model slope with rank-one corrections — O(n)
dependent steps, hostile to a vector machine. Here the walk is closed-form
vectorized: along the projected path x(t) = P(x − t g) the model derivative
on segment j is linear, m'(t) = f1_j + t·f2_j, with

    f1_j = −q_j − c_jᵀ M a_j,      f2_j = θ q_j − c_jᵀ M c_j,

where q_j (Σ g² over still-moving vars), c_j (Σ g_i W_i over moving) and
a_j (Σ t_i g_i W_i over already-fixed) are PREFIX/SUFFIX SUMS over the
breakpoint-sorted coordinates — one sort + two cumsums + batched (2m)
contractions for ALL segments at once. The first segment whose slope turns
nonnegative (or whose interior minimizer lies inside it) gives the GCP in
O(n·m) fully parallel work.

Step (2) uses the compact representation B = θI − W M Wᵀ
(W = [Y, θS], M⁻¹ = [[−D, Lᵀ], [L, θ SᵀS]]) and Sherman–Morrison–Woodbury
on the free subspace (2m×2m solves, masked matmuls — no gathers).

Flat decision vectors only (the GCP breakpoint order needs one global
sort); the pytree/time-sharded path keeps the projection solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from varanneal_tpu.opt.lbfgs import (
    LBFGSResult, LBFGSOptions, CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL,
    _wolfe_line_search)

from typing import NamedTuple, Optional


class _BState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    S: jnp.ndarray          # (m, n) step history
    Yh: jnp.ndarray         # (m, n) grad-diff history
    head: jnp.ndarray
    hlen: jnp.ndarray
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def _proj_grad_norm(x, g, lo, hi):
    return jnp.max(jnp.abs(x - jnp.clip(x - g, lo, hi)))


def _compact_matrices(S, Yh, head, hlen, m, dtype):
    """Assemble θ, Wt (2m, n), and M⁻¹ (2m, 2m) of the compact direct
    Hessian B = θI − W M Wᵀ, with invalid history slots padded so their
    contribution is exactly zero (W columns zeroed, M⁻¹ identity there)."""
    j = jnp.arange(m)
    ord_ = (head - m + j) % m                      # oldest..newest
    valid = j >= (m - hlen)
    vf = valid.astype(dtype)

    S_o = S[ord_] * vf[:, None]                    # (m, n)
    Y_o = Yh[ord_] * vf[:, None]

    SY = S_o @ Y_o.T                               # (m, m): s_i . y_j
    SS = S_o @ S_o.T
    D = jnp.diag(SY)
    sy_new = SY[m - 1, m - 1]
    yy_new = jnp.sum(Y_o[m - 1] * Y_o[m - 1])
    theta = jnp.where(hlen > 0,
                      yy_new / jnp.maximum(sy_new, 1e-300),
                      jnp.asarray(1.0, dtype))

    Lm = jnp.tril(SY, k=-1)                        # L_ij = s_i.y_j, i > j
    # M⁻¹ = [[−D, Lᵀ], [L, θ SᵀS]], identity on invalid slots
    pad = jnp.diag(jnp.where(valid, 0.0, 1.0).astype(dtype))
    Minv = jnp.block([[-jnp.diag(D) + pad, Lm.T],
                      [Lm, theta * SS + pad]])
    Wt = jnp.concatenate([Y_o, theta * S_o], axis=0)   # (2m, n)
    return theta, Wt, Minv


def _cauchy_point(x, g, lo, hi, theta, Wt, Minv, dtype):
    """Generalized Cauchy point along P(x − t g), vectorized over all
    breakpoint segments (see module docstring). Returns (x_cp, free_mask)."""
    n = x.shape[0]
    two_m = Wt.shape[0]
    BIGT = jnp.asarray(1e30, dtype)

    t_i = jnp.where(
        g > 0, (x - lo) / g,
        jnp.where(g < 0, (x - hi) / g, BIGT))
    t_i = jnp.where(jnp.isfinite(t_i), jnp.minimum(t_i, BIGT), BIGT)
    t_i = jnp.maximum(t_i, 0.0)

    order = jnp.argsort(t_i)
    ts = t_i[order]                                # ascending breakpoints
    g_s = g[order]
    Wg = Wt.T[order] * g_s[:, None]                # (n, 2m): g_i W_i rows

    g2 = g_s * g_s
    # prefix sums EXCLUSIVE of entry j (the first j sorted vars are fixed
    # inside segment j)
    csum = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(g2)])
    q = jnp.sum(g2) - csum[:-1]                    # (n,) Σ_moving g²
    cW = jnp.concatenate([jnp.zeros((1, two_m), dtype),
                          jnp.cumsum(Wg, axis=0)])
    c = (jnp.sum(Wg, axis=0)[None, :] - cW[:-1])   # (n, 2m) Σ_moving g W
    aW = jnp.concatenate([jnp.zeros((1, two_m), dtype),
                          jnp.cumsum(Wg * ts[:, None], axis=0)])
    a = aW[:-1]                                    # (n, 2m) Σ_fixed t g W

    M = _dense_inv(Minv)                           # (2m, 2m), cheap
    Ma = a @ M                                     # (n, 2m)
    Mc = c @ M
    f1 = -q - jnp.sum(Mc * a, axis=1)              # cᵀ M a == (cM)·a
    f2 = theta * q - jnp.sum(Mc * c, axis=1)
    f2 = jnp.maximum(f2, jnp.asarray(1e-30, dtype))  # B is PD; guard 0

    start = jnp.concatenate([jnp.zeros((1,), dtype), ts[:-1]])
    end = ts
    slope_at_start = f1 + start * f2
    t_star = -f1 / f2
    hit_start = slope_at_start >= 0
    hit_inside = (~hit_start) & (t_star <= end)
    valid = hit_start | hit_inside
    cand = jnp.where(hit_start, start, t_star)

    any_valid = jnp.any(valid)
    j_star = jnp.argmax(valid)                     # first True
    t_max = jnp.max(jnp.where(ts >= BIGT, 0.0, ts))
    t_cp = jnp.where(any_valid, cand[j_star], t_max)
    t_cp = jnp.maximum(t_cp, 0.0)

    x_cp = jnp.clip(x - t_cp * g, lo, hi)
    free = (t_i > t_cp)                            # still moving at the GCP
    return x_cp, free


def _dense_solve(A, b):
    """Solve the SMALL dense system A x = b (2m x 2m) by Gauss–Jordan
    elimination with partial pivoting, built from elementwise ops under a
    fori_loop — deliberately NO ``jnp.linalg.solve``/``inv``: those lower
    to XLA's LuDecomposition custom call, which the TPU backend
    implements for F32 only, so an f64 bounded-L-BFGS program fails to
    compile ("Only F32 and C64 types are implemented in LuDecomposition"
    — the round-2 'f64 NaKL-SH compiler crash', root-caused round 3).
    At 2m ~ 10 the sequential loop is negligible. ``b``: (n,) or
    (n, k)."""
    n = A.shape[-1]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    Ab = jnp.concatenate([A, B], axis=-1)
    idx = jnp.arange(n)

    def step(k, Ab):
        col = Ab[:, k]
        mag = jnp.where(idx >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(mag)
        rk, rp = Ab[k], Ab[p]
        Ab = Ab.at[k].set(rp).at[p].set(rk)
        piv = Ab[k, k]
        denom = jnp.where(piv == 0, 1.0, piv)
        row_k = Ab[k] / denom
        Ab = Ab.at[k].set(row_k)
        factors = jnp.where(idx == k, 0.0, Ab[:, k])
        return Ab - factors[:, None] * row_k[None, :]

    Ab = jax.lax.fori_loop(0, n, step, Ab)
    out = Ab[:, n:]
    return out[:, 0] if vec else out


def _dense_inv(A):
    """Small dense inverse via :func:`_dense_solve` on the identity (same
    no-LuDecomposition rationale)."""
    return _dense_solve(A, jnp.eye(A.shape[-1], dtype=A.dtype))


def _subspace_step(x, g, x_cp, free, lo, hi, theta, Wt, Minv, dtype):
    """Direct primal subspace minimization (BLNZ §5.1) from the GCP over
    the free variables, via SMW on B_FF = θI − Ŵ M Ŵᵀ; the step is
    truncated to the feasible box. Returns the target point x_bar."""
    fm = free.astype(dtype)
    u_cp = x_cp - x
    # r = ∇m(x_cp) = g + B u_cp, restricted to free
    Wu = Wt @ u_cp                                 # (2m,)
    Bu = theta * u_cp - Wt.T @ _dense_solve(Minv, Wu)
    r = (g + Bu) * fm

    Wf = Wt * fm[None, :]                          # Ŵᵀ as (2m, n) masked
    Wr = Wf @ r                                    # Ŵᵀ r_F
    G2 = Wf @ Wf.T                                 # ŴᵀŴ (2m, 2m)
    # (θ I − Ŵ M Ŵᵀ)⁻¹ = (1/θ)I + (1/θ²) Ŵ (M⁻¹ − (1/θ)ŴᵀŴ)⁻¹ Ŵᵀ
    K = Minv - G2 / theta
    inner = _dense_solve(K, Wr)
    d = -(r / theta + (Wf.T @ inner) / (theta * theta))
    d = d * fm

    # Infeasible subspace minimizer: PROJECT it onto the box per
    # coordinate (Morales–Nocedal 2011 revision of Algorithm 778 — the
    # version SciPy ships) rather than scaling the whole step to the
    # first bound crossing. With thousands of box-hugging variables the
    # original scaling collapses the step (measured α* ~ 1e-7 on the
    # NaKL gates); projection keeps full length in non-binding
    # coordinates. A non-descent projected step falls back in the caller.
    return jnp.clip(x_cp + d, lo, hi)


def lbfgsb_minimize(value_and_grad, x0, *, lower, upper,
                    opts: Optional[LBFGSOptions] = None) -> LBFGSResult:
    """Bound-constrained L-BFGS with GCP + subspace minimization (the
    SciPy/Fortran L-BFGS-B algorithm). Flat 1-D decision vectors only;
    same result contract as ``lbfgs_minimize``."""
    opts = opts or LBFGSOptions()
    x0 = jnp.asarray(x0)
    if x0.ndim != 1:
        raise ValueError("lbfgsb_minimize requires a flat 1-D x0")
    dtype = x0.dtype
    m = opts.m
    n = x0.shape[0]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    lo = (jnp.full((n,), -big, dtype) if lower is None
          else jnp.broadcast_to(jnp.asarray(lower, dtype), (n,)))
    hi = (jnp.full((n,), big, dtype) if upper is None
          else jnp.broadcast_to(jnp.asarray(upper, dtype), (n,)))

    x0 = jnp.clip(x0, lo, hi)
    f0, g0 = value_and_grad(x0)
    pg0 = _proj_grad_norm(x0, g0, lo, hi)
    init = _BState(
        x=x0, f=f0, g=g0,
        S=jnp.zeros((m, n), dtype), Yh=jnp.zeros((m, n), dtype),
        head=jnp.zeros((), jnp.int32), hlen=jnp.zeros((), jnp.int32),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pg0 <= opts.pgtol, CONV_GRAD, MAXITER).astype(
            jnp.int32),
        done=pg0 <= opts.pgtol)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        theta, Wt, Minv = _compact_matrices(
            s.S, s.Yh, s.head, s.hlen, m, dtype)
        x_cp, free = _cauchy_point(s.x, s.g, lo, hi, theta, Wt, Minv,
                                   dtype)
        x_bar = _subspace_step(s.x, s.g, x_cp, free, lo, hi, theta, Wt,
                               Minv, dtype)
        x_bar = jnp.clip(x_bar, lo, hi)
        d = x_bar - s.x

        descent = jnp.vdot(s.g, d)
        # fall back to the GCP direction, then projected steepest descent
        d_cp = x_cp - s.x
        use_cp = (descent >= 0) | ~jnp.isfinite(descent)
        d = jnp.where(use_cp, d_cp, d)
        descent = jnp.vdot(s.g, d)
        d_sd = jnp.clip(s.x - s.g, lo, hi) - s.x
        use_sd = (descent >= 0) | ~jnp.isfinite(descent)
        d = jnp.where(use_sd, d_sd, d)

        # strong-Wolfe along d: a=1 reaches the subspace minimizer, and the
        # search may extend to the box-feasibility limit along d
        # (L-BFGS-B dcsrch stpmax semantics; Armijo-only accept at the cap)
        amax_i = jnp.where(
            d > 0, (hi - s.x) / d,
            jnp.where(d < 0, (lo - s.x) / d, jnp.inf))
        a_max = jnp.min(jnp.where(jnp.isfinite(amax_i), amax_i, jnp.inf))
        a_max = jnp.clip(jnp.where(jnp.isfinite(a_max), a_max, 1.0),
                         1.0, jnp.asarray(1e10, dtype))
        a, f_new, g_new, ls_nfev, ls_ok = _wolfe_line_search(
            value_and_grad, s.x, d, s.f, s.g, jnp.asarray(1.0, dtype),
            a_max, opts)
        # a carries the objective's value dtype (f64 scalars under a
        # compensated-f32 objective) — keep the decision vector in its own
        # dtype
        x_new = jnp.clip(s.x + a.astype(s.x.dtype) * d, lo, hi)

        # ---- history update (skip on tiny curvature) --------------------
        sv = x_new - s.x
        yv = g_new - s.g
        sy = jnp.vdot(sv, yv)
        s_nrm = jnp.sqrt(jnp.vdot(sv, sv))
        y_nrm = jnp.sqrt(jnp.vdot(yv, yv))
        good = ls_ok & (sy > 1e-10 * s_nrm * y_nrm) & (sy > 0)
        S = jnp.where(good, s.S.at[s.head].set(sv), s.S)
        Yh = jnp.where(good, s.Yh.at[s.head].set(yv), s.Yh)
        head = jnp.where(good, (s.head + 1) % m, s.head)
        hlen = jnp.where(good, jnp.minimum(s.hlen + 1, m), s.hlen)

        # ---- termination -------------------------------------------------
        pgn = _proj_grad_norm(x_new, g_new, lo, hi)
        df = s.f - f_new
        fden = jnp.maximum(jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0)
        conv_g = pgn <= opts.pgtol
        conv_f = ls_ok & (df <= opts.ftol * fden)
        fail = ~ls_ok
        done = conv_g | conv_f | fail
        status = jnp.where(
            conv_g, CONV_GRAD,
            jnp.where(fail, LS_FAIL,
                      jnp.where(conv_f, CONV_FTOL, MAXITER))).astype(
            jnp.int32)
        x_out = jnp.where(fail, s.x, x_new)
        f_out = jnp.where(fail, s.f, f_new)
        g_out = jnp.where(fail, s.g, g_new)
        return _BState(x=x_out, f=f_out, g=g_out, S=S, Yh=Yh, head=head,
                       hlen=hlen, niter=s.niter + 1,
                       nfev=s.nfev + ls_nfev, status=status, done=done)

    s = lax.while_loop(cond, body, init)
    pgn = _proj_grad_norm(s.x, s.g, lo, hi)
    return LBFGSResult(x=s.x, f=s.f, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=pgn)
