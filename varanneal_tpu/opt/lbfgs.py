"""Bounded L-BFGS, device-side, pytree-native, as one ``lax.while_loop``.

This replaces the reference's inner minimizer — SciPy's Fortran L-BFGS-B
(``varanneal/_autodiffmin.py :: ADmin.min_lbfgs_scipy`` [M, SURVEY.md §2]) —
with a pure-JAX implementation so the whole annealing ladder compiles into a
single XLA program and vmaps across ensemble members (SURVEY.md §7
"hard parts" #1).

Design:

- the decision variable is an arbitrary PYTREE of arrays (a flat vector is
  the 1-leaf special case). This is what lets the time axis of a single
  problem stay a (N_f, D) array sharded over a mesh axis — GSPMD then
  partitions the optimizer state (history pytrees) the same way and inserts
  halo collectives for the stencil in the objective, the sequence-parallel
  analog of SURVEY.md §5;
- two-loop recursion over a static-size circular history (m slots, dynamic
  row gathers per leaf, no rolling copies);
- strong-Wolfe line search (bracket + zoom with safeguarded cubic
  interpolation) run as a one-eval-per-iteration state machine inside a
  nested ``lax.while_loop`` — exactly one value_and_grad per line-search
  step, so evals/sec is a clean metric;
- box bounds via active-set gradient projection: bound-active components are
  frozen out of the direction, the step is capped at the first bound crossing
  and the iterate clipped — L-BFGS-B *semantics* (projected-gradient
  termination, feasible iterates), not its subspace minimization. Parity with
  SciPy is defined at converged minima (SURVEY.md §7), and tested;
- termination mirrors SciPy L-BFGS-B: ``pgtol`` on the max-norm of the
  projected gradient, ``ftol`` on the relative action decrease, ``maxiter``.

Everything is static-shape and data-branch-free, so the solver vmaps: under
vmap the while_loop runs until all lanes converge, with converged lanes
masked to no-ops (the ``done`` flag guards every state update).
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax, tree_util as jtu


@dataclasses.dataclass(frozen=True)
class LBFGSOptions:
    """Solver options (defaults mirror SciPy L-BFGS-B's)."""
    m: int = 10                 # history size (scipy maxcor)
    maxiter: int = 1000
    ftol: float = 2.220446049250313e-09   # scipy default factr=1e7 -> 1e7*eps
    pgtol: float = 1e-5
    maxls: int = 30
    c1: float = 1e-4            # Armijo constant
    c2: float = 0.9             # curvature constant
    # direction computation: 'auto' (the measured winner per regime:
    # 'compact_pallas' for flat f32 vectors on TPU, else 'compact'),
    # 'compact' (Byrd–Nocedal–Schnabel: 3 batched matvecs + (m,m)
    # triangular solves), 'two_loop' (classic 2m-step sequential
    # recursion), or 'compact_pallas' (the whole compact-form direction
    # fused into ONE Pallas launch per member — kernels/dir_pallas.py;
    # measured 0.311 vs 0.340 s/init on the canonical bench ladder)
    direction: str = "auto"
    # bound handling: 'auto' (default — PROJECTION, round-5
    # data-backed flip: the paired 18-param campaign measured identical
    # hit rate [24/24 both], equal converged actions and slightly
    # better parameter errors at 1.70x less wall than subspace, and the
    # CPU f64 bounded ladder measured 4.5x — on top of round-4's 3-10x
    # TPU bounded A/Bs; the facade's solver='auto' additionally serves
    # bounded problems in the fused Pallas kernel with the same
    # projection semantics), 'subspace' (full L-BFGS-B: generalized
    # Cauchy point + free-subspace direct solve, opt/lbfgsb.py —
    # matches the reference's Fortran algorithm ITERATE-FOR-ITERATE;
    # pass explicitly for reference-parity runs; converges deeper per
    # rung mid-ladder but to the same minima), or 'projection'
    # (active-set freezing + projected-path Armijo — works on any
    # pytree)
    bounded_algo: str = "auto"


class LBFGSResult(NamedTuple):
    x: object               # pytree, same structure as x0
    f: jnp.ndarray
    g: object               # pytree
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray     # 0 pgtol-converged, 1 ftol-converged,
    #                         2 maxiter, 3 line-search failure / NaN
    pgnorm: jnp.ndarray


# status codes
CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# pytree vector-space helpers
# ---------------------------------------------------------------------------

def _tmap(f, *trees):
    return jtu.tree_map(f, *trees)


def _treduce(op, tree, init):
    return jtu.tree_reduce(op, tree, init)


def _tdot(a, b):
    parts = _tmap(lambda u, v: jnp.sum(u * v), a, b)
    return _treduce(lambda s, l: s + l, parts, 0.0)


def _tmax_abs(tree):
    parts = _tmap(lambda u: jnp.max(jnp.abs(u)), tree)
    return _treduce(jnp.maximum, parts, jnp.zeros(()))


def _axpy(a, x, y):
    """y + a * x elementwise over the tree (a scalar). ``a`` is cast to
    each leaf's dtype: with a compensated-f32 objective the f-values (and
    step lengths derived from them) are f64 scalars, and promoting the
    decision tree to f64 here would both break the while-carry dtypes and
    silently run the whole model in emulated f64."""
    return _tmap(lambda u, v: v + a.astype(u.dtype) * u
                 if hasattr(a, "astype") else v + a * u, x, y)


def _scale(a, x):
    return _tmap(lambda u: a * u, x)


def _where_s(c, a, b):
    """Select whole trees by a scalar bool (broadcast into every leaf)."""
    return _tmap(lambda u, v: jnp.where(c, u, v), a, b)


def _project(x, lower, upper):
    return _tmap(jnp.clip, x, lower, upper)


def _proj_grad(x, g, lower, upper):
    """SciPy's projected gradient: x - P(x - g)."""
    return _tmap(lambda xi, gi, lo, hi: xi - jnp.clip(xi - gi, lo, hi),
                 x, g, lower, upper)


def _cubic_min(a, fa, dfa, b, fb, dfb):
    """Minimizer of the cubic Hermite interpolant on [a, b]; NaN-safe fall
    back to bisection."""
    d1 = dfa + dfb - 3.0 * (fa - fb) / (a - b)
    arg = d1 * d1 - dfa * dfb
    d2 = jnp.sqrt(jnp.maximum(arg, 0.0)) * jnp.sign(b - a)
    denom = dfb - dfa + 2.0 * d2
    t = b - (b - a) * (dfb + d2 - d1) / denom
    bad = (arg < 0.0) | ~jnp.isfinite(t) | (denom == 0.0)
    return jnp.where(bad, 0.5 * (a + b), t)


class _LSState(NamedTuple):
    stage: jnp.ndarray      # 0 bracket, 1 zoom
    done: jnp.ndarray
    failed: jnp.ndarray
    i: jnp.ndarray          # evals used
    a: jnp.ndarray          # next trial step
    a_prev: jnp.ndarray
    f_prev: jnp.ndarray
    d_prev: jnp.ndarray     # dphi at a_prev
    a_lo: jnp.ndarray
    f_lo: jnp.ndarray
    d_lo: jnp.ndarray
    a_hi: jnp.ndarray
    f_hi: jnp.ndarray
    d_hi: jnp.ndarray
    a_star: jnp.ndarray
    f_star: jnp.ndarray
    g_star: object          # gradient pytree at accepted point


def _wolfe_line_search(vag, x, d, f0, g0, a_init, a_max, opts: LBFGSOptions):
    """Strong-Wolfe line search along tree-direction d from tree-point x.

    ``vag(x) -> (f, g)``. Returns (a_star, f_star, g_star, nfev, ok).
    One vag evaluation per while iteration.
    """
    dtype = f0.dtype
    dphi0 = _tdot(g0, d).astype(dtype)
    c1, c2 = jnp.asarray(opts.c1, dtype), jnp.asarray(opts.c2, dtype)
    zero = jnp.zeros((), dtype)

    init = _LSState(
        stage=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
        failed=jnp.zeros((), bool), i=jnp.zeros((), jnp.int32),
        a=jnp.minimum(jnp.asarray(a_init, dtype), a_max),
        a_prev=zero, f_prev=f0, d_prev=dphi0,
        a_lo=zero, f_lo=f0, d_lo=dphi0,
        a_hi=zero, f_hi=f0, d_hi=dphi0,
        a_star=zero, f_star=f0, g_star=g0)

    def cond(s):
        return ~(s.done | s.failed) & (s.i < opts.maxls)

    def body(s):
        # Both line-search stages (bracket / zoom) are cheap scalar math on
        # the one evaluation below — computing both and SELECTING by stage
        # (instead of lax.cond) removes a conditional from the inner hot
        # loop and lets XLA fuse the whole state machine into one scalar
        # kernel (the per-iteration kernel chain is the measured wall —
        # PARITY.md roofline).
        f_a, g_a = vag(_axpy(s.a, d, x))
        dphi_a = _tdot(g_a, d).astype(dtype)
        i = s.i + 1
        armijo_fail = (f_a > f0 + c1 * s.a * dphi0)
        nan_bad = ~jnp.isfinite(f_a)
        curv_ok = jnp.abs(dphi_a) <= -c2 * dphi0
        in_br = s.stage == 0

        # ---- bracket stage (Nocedal-Wright alg. 3.5) after one eval at
        # s.a. At the feasible-step cap a_max the curvature condition may
        # be unattainable — accept on Armijo alone there (L-BFGS-B's
        # dcsrch stpmax semantics), else bound-capped steps deadlock.
        at_cap = s.a >= a_max
        hi_b = armijo_fail | ((i > 1) & (f_a >= s.f_prev)) | nan_bad
        accept_b = ~hi_b & (curv_ok | at_cap)
        to_zoom_rev = ~hi_b & ~curv_ok & ~at_cap & (dphi_a >= 0)
        enter_zoom = hi_b | to_zoom_rev
        a_lo_b = jnp.where(hi_b, s.a_prev, s.a)
        f_lo_b = jnp.where(hi_b, s.f_prev, f_a)
        d_lo_b = jnp.where(hi_b, s.d_prev, dphi_a)
        a_hi_b = jnp.where(hi_b, s.a, s.a_prev)
        f_hi_b = jnp.where(hi_b, f_a, s.f_prev)
        d_hi_b = jnp.where(hi_b, dphi_a, s.d_prev)

        # ---- zoom stage ------------------------------------------------
        hi_z = armijo_fail | (f_a >= s.f_lo) | nan_bad
        accept_z = ~hi_z & curv_ok
        swap = ~hi_z & ~curv_ok & (dphi_a * (s.a_hi - s.a_lo) >= 0)
        a_hi_z = jnp.where(hi_z, s.a, jnp.where(swap, s.a_lo, s.a_hi))
        f_hi_z = jnp.where(hi_z, f_a, jnp.where(swap, s.f_lo, s.f_hi))
        d_hi_z = jnp.where(hi_z, dphi_a, jnp.where(swap, s.d_lo, s.d_hi))
        a_lo_z = jnp.where(hi_z, s.a_lo, s.a)
        f_lo_z = jnp.where(hi_z, s.f_lo, f_a)
        d_lo_z = jnp.where(hi_z, s.d_lo, dphi_a)

        # ---- merged next state ----------------------------------------
        a_lo = jnp.where(in_br, a_lo_b, a_lo_z)
        f_lo = jnp.where(in_br, f_lo_b, f_lo_z)
        d_lo = jnp.where(in_br, d_lo_b, d_lo_z)
        a_hi = jnp.where(in_br, a_hi_b, a_hi_z)
        f_hi = jnp.where(in_br, f_hi_b, f_hi_z)
        d_hi = jnp.where(in_br, d_hi_b, d_hi_z)
        width = jnp.abs(a_hi - a_lo)
        a_interp = _cubic_min(a_lo, f_lo, d_lo, a_hi, f_hi, d_hi)
        a_interp = jnp.clip(a_interp,
                            jnp.minimum(a_lo, a_hi) + 0.1 * width,
                            jnp.maximum(a_lo, a_hi) - 0.1 * width)
        a_expand = jnp.minimum(2.0 * s.a, a_max)
        a_next = jnp.where(in_br & ~enter_zoom, a_expand, a_interp)
        tiny = width <= 1e-14 * jnp.maximum(1.0, jnp.abs(a_lo))
        accept = jnp.where(in_br, accept_b, accept_z)
        failed = jnp.where(in_br, nan_bad & (i >= opts.maxls),
                           tiny & ~accept)
        stage = jnp.where(in_br & ~enter_zoom, 0, 1).astype(jnp.int32)
        return s._replace(
            stage=stage, done=accept, failed=failed, i=i, a=a_next,
            a_prev=s.a, f_prev=jnp.where(in_br, f_a, s.f_prev),
            d_prev=jnp.where(in_br, dphi_a, s.d_prev),
            a_lo=a_lo, f_lo=f_lo, d_lo=d_lo,
            a_hi=a_hi, f_hi=f_hi, d_hi=d_hi,
            a_star=jnp.where(accept, s.a, s.a_star),
            f_star=jnp.where(accept, f_a, s.f_star),
            g_star=_where_s(accept, g_a, s.g_star))

    s = lax.while_loop(cond, body, init)

    # Fallback: no Wolfe point found but the zoom bracket's lo end still
    # improves on f0 (Armijo holds there by construction) — take it.
    have_lo = (s.a_lo > 0) & (s.f_lo < f0)
    ok = s.done | have_lo

    def eval_lo():
        f_lo, g_lo = vag(_axpy(s.a_lo, d, x))
        return s.a_lo, f_lo, g_lo

    a_star, f_star, g_star = lax.cond(
        s.done,
        lambda: (s.a_star, s.f_star, s.g_star),
        lambda: lax.cond(
            have_lo, eval_lo, lambda: (jnp.zeros_like(s.a_star), f0, g0)))
    nfev = s.i + jnp.where(s.done | ~have_lo, 0, 1)
    return a_star, f_star, g_star, nfev, ok


class _PBState(NamedTuple):
    done: jnp.ndarray
    i: jnp.ndarray
    a: jnp.ndarray
    x_a: object
    f_a: jnp.ndarray
    g_a: object


def _projected_backtracking_ls(vag, x, d, f0, g0, a_init, lower, upper,
                               opts: LBFGSOptions):
    """Armijo backtracking along the PROJECTED path P(x + a d) (Bertsekas /
    projected-quasi-Newton): sufficient decrease measured against
    g0.(P(x+a d) - x). Handles bound crossings without capping the step —
    this is what lets bound-active NaKL-style problems keep making progress
    where a capped Wolfe search deadlocks.

    Returns (x_new, f_new, g_new, nfev, ok).
    """
    dtype = f0.dtype
    c1 = jnp.asarray(opts.c1, dtype)

    def trial(a):
        return _project(_axpy(a, d, x), lower, upper)

    x0t = trial(jnp.asarray(a_init, dtype))
    f0t, g0t = vag(x0t)
    init = _PBState(done=jnp.zeros((), bool), i=jnp.ones((), jnp.int32),
                    a=jnp.asarray(a_init, dtype), x_a=x0t, f_a=f0t,
                    g_a=g0t)

    def cond(s):
        return ~s.done & (s.i < opts.maxls)

    def body(s):
        gdx = _tdot(g0, _tmap(lambda u, v: u - v, s.x_a, x))
        ok = (s.f_a <= f0 + c1 * gdx) & jnp.isfinite(s.f_a) & (s.f_a < f0)
        a_next = 0.5 * s.a

        def shrink():
            x_n = trial(a_next)
            f_n, g_n = vag(x_n)
            return s._replace(i=s.i + 1, a=a_next, x_a=x_n, f_a=f_n,
                              g_a=g_n)

        return lax.cond(ok, lambda: s._replace(done=jnp.ones((), bool)),
                        shrink)

    s = lax.while_loop(cond, body, init)
    # final acceptance check (covers the case the loop exited on maxls)
    gdx = _tdot(g0, _tmap(lambda u, v: u - v, s.x_a, x))
    ok = (s.f_a <= f0 + c1 * gdx) & jnp.isfinite(s.f_a) & (s.f_a < f0)
    x_new = _where_s(ok, s.x_a, x)
    f_new = jnp.where(ok, s.f_a, f0)
    g_new = _where_s(ok, s.g_a, g0)
    return x_new, f_new, g_new, s.i, ok


class _State(NamedTuple):
    x: object             # pytree
    f: jnp.ndarray
    g: object             # pytree
    H: object             # pytree of (2m, *leaf) JOINT history: rows
    #                       [0, m) are the steps s_i, rows [m, 2m) the
    #                       grad-diffs y_i. One buffer (instead of separate
    #                       S/Y trees) lets the compact direction compute
    #                       its Gram matrix, its history matvec, and its
    #                       final contraction in ONE kernel each — the
    #                       per-iteration sequential-kernel chain is the
    #                       measured wall at small sizes (PARITY.md
    #                       roofline: serialization-bound)
    rho: jnp.ndarray      # (m,) 1/(y.s)
    head: jnp.ndarray     # next write slot
    hlen: jnp.ndarray     # valid history length
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def _hist_row(H, i):
    return _tmap(lambda h: jnp.take(h, i, axis=0), H)


def _hist_set_pair(H, m, i, sv, yv, keep):
    """Write (s, y) into joint-history rows i and m+i where ``keep``."""
    return _tmap(
        lambda h, u, w: jnp.where(keep, h.at[i].set(u).at[m + i].set(w), h),
        H, sv, yv)


def _two_loop(g, H, rho, head, hlen, m, dtype):
    """Two-loop recursion, newest-to-oldest via dynamic row gathers."""
    q = g
    alphas = []
    idxs = []
    for j in range(m):
        i = (head - 1 - j) % m
        idxs.append(i)
        valid = (j < hlen).astype(dtype)
        s_i = _hist_row(H, i)
        y_i = _hist_row(H, m + i)
        r_i = jnp.take(rho, i)
        a = valid * r_i * _tdot(s_i, q)
        q = _axpy(-a, y_i, q)
        alphas.append(a)
    i0 = (head - 1) % m
    y0 = _hist_row(H, m + i0)
    s0 = _hist_row(H, i0)
    yy = _tdot(y0, y0)
    gamma = jnp.where(hlen > 0, _tdot(s0, y0) / jnp.maximum(yy, 1e-300), 1.0)
    r = _scale(gamma, q)
    for j in reversed(range(m)):
        i = idxs[j]
        s_i = _hist_row(H, i)
        y_i = _hist_row(H, m + i)
        r_i = jnp.take(rho, i)
        valid = (j < hlen).astype(dtype)
        b = valid * r_i * _tdot(y_i, r)
        r = _axpy(alphas[j] - b, s_i, r)
    return _scale(-1.0, r)


def _mat_rows_dot(A, B, m):
    """(m, m) Gram-like matrix of two history pytrees: out[i,j] = a_i . b_j,
    summing per-leaf (m, k) @ (k, m) matmuls — ONE batched contraction per
    leaf instead of m^2 sequential dots."""
    total = None
    for a, b in zip(jtu.tree_leaves(A), jtu.tree_leaves(B)):
        a2 = a.reshape(m, -1)
        b2 = b.reshape(m, -1)
        g = a2 @ b2.T
        total = g if total is None else total + g
    return total


def _mat_vec(A, v, m):
    """out[i] = a_i . v for a history pytree A and point-pytree v."""
    total = None
    for a, x in zip(jtu.tree_leaves(A), jtu.tree_leaves(v)):
        g = a.reshape(m, -1) @ x.reshape(-1)
        total = g if total is None else total + g
    return total


def _vec_mat(q, A):
    """sum_i q[i] * a_i as a point-pytree (transpose of _mat_vec)."""
    return _tmap(lambda a: jnp.tensordot(q, a, axes=1), A)


def _compact_dir(g, H, rho, head, hlen, m, dtype):
    """L-BFGS direction via the Byrd–Nocedal–Schnabel compact
    representation — numerically the same inverse-Hessian application as
    the two-loop recursion, but expressed as batched matvecs plus (m, m)
    triangular solves, which cuts the sequential-op chain per iteration
    (TPU launch latency) from ~4m to ~6.

        Hinv = γI + [S γY] [[R^{-T}(D+γYᵀY)R^{-1}, -R^{-T}], [-R^{-1}, 0]]
                     [Sᵀ; γYᵀ],   R = triu(SᵀY), D = diag(SᵀY)

    ``H`` is the JOINT (2m, n) history (rows [0, m) = S, rows [m, 2m) = Y),
    so the Gram matrix (SᵀY and YᵀY as blocks of one product), the history
    matvec ([Sᵀg; Yᵀg]), and the closing contraction ([q1; γq2]·H) are one
    batched op each — three kernels where the split-S/Y layout needed six
    (the serialization wall, PARITY.md roofline).
    """
    del rho
    from jax.scipy.linalg import solve_triangular

    # order: slot ord[j] holds the j-th oldest pair; first m-hlen invalid
    j = jnp.arange(m)
    ord_ = (head - m + j) % m
    valid = j >= (m - hlen)                 # (m,) bool, oldest..newest
    vf = valid.astype(dtype)

    G = _mat_rows_dot(H, H, 2 * m)                    # one (2m, 2m) Gram
    SY = G[:m, m:][ord_][:, ord_]                     # [i,j] = s_i . y_j
    YY = G[m:, m:][ord_][:, ord_]
    mask2 = vf[:, None] * vf[None, :]
    SY = SY * mask2
    YY = YY * mask2
    R = jnp.triu(SY)
    # unit diagonal on invalid slots keeps the triangular solves regular
    R = R + jnp.diag(jnp.where(valid, 0.0, 1.0).astype(dtype))
    Dd = jnp.diag(jnp.diag(SY))

    sy_new = SY[m - 1, m - 1]
    yy_new = YY[m - 1, m - 1]
    gamma = jnp.where(hlen > 0, sy_new / jnp.maximum(yy_new, 1e-300),
                      jnp.asarray(1.0, dtype))

    ab = _mat_vec(H, g, 2 * m)                        # [Sᵀg; Yᵀg]
    a = ab[:m][ord_] * vf
    b = ab[m:][ord_] * vf

    u = solve_triangular(R, a, lower=False)           # R^{-1} a
    v = (Dd + gamma * YY) @ u - gamma * b
    w = solve_triangular(R.T, v, lower=True)          # R^{-T} v
    q1 = w * vf
    q2 = -u * vf

    # scatter back to raw slot order and contract with the joint history:
    # Hinv g = γg + S·q1 + γ(Y·q2) = γg + [q1; γq2]·H
    ord2 = jnp.concatenate([ord_, m + ord_])
    q_full = jnp.zeros(2 * m, dtype).at[ord2].set(
        jnp.concatenate([q1, gamma * q2]))
    Hq = _vec_mat(q_full, H)
    Hg = _tmap(lambda gi, hi: gamma * gi + hi, g, Hq)
    return _scale(-1.0, Hg)


def _pallas_dir(g, H, rho, head, hlen, m, dtype):
    """Dispatch the direction to the fused single-launch Pallas kernel
    (kernels/dir_pallas.py). Only reached when ``pallas_dir_supported``
    held at build time (flat f32 vector on TPU)."""
    del rho, m, dtype
    from varanneal_tpu.kernels.dir_pallas import compact_dir_pallas
    d = compact_dir_pallas(jtu.tree_leaves(g)[0], jtu.tree_leaves(H)[0],
                           head, hlen)
    return jtu.tree_unflatten(jtu.tree_structure(g), [d])


class _FState(NamedTuple):
    x: object               # pytree (single flat leaf)
    f: jnp.ndarray
    g: object               # pytree (single flat leaf)
    A: jnp.ndarray          # (16, n_pad) padded augmented history block
    d: jnp.ndarray          # (n,) next search direction
    gnorm1: jnp.ndarray
    head: jnp.ndarray
    hlen: jnp.ndarray
    niter: jnp.ndarray
    nfev: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray


def _lbfgs_fused_loop(value_and_grad, x0, opts, m, dtype):
    """Unbounded L-BFGS with the FUSED per-iteration Pallas step: the
    history update, termination scalars, and the next compact-form
    direction all ride ONE kernel launch per iteration
    (kernels/dir_pallas.py::fused_step). Semantics match the generic
    loop with direction='compact' (tested); only reached for flat f32
    decision vectors on TPU (``pallas_step_supported``). The roofline
    study (PARITY.md) shows this regime is serialization-bound, so the
    win is kernel COUNT, not FLOPs: everything between two line
    searches collapses into one launch plus scalar bookkeeping."""
    from varanneal_tpu.kernels.dir_pallas import fused_step
    tdef = jtu.tree_structure(x0)
    x0_leaf = jtu.tree_leaves(x0)[0]
    n = x0_leaf.shape[0]
    n_pad = -(-n // 128) * 128
    rows = 16
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    f0, g0 = value_and_grad(x0)
    g0_leaf = jtu.tree_leaves(g0)[0]
    pg0 = jnp.max(jnp.abs(g0_leaf))
    A0 = jnp.zeros((rows, n_pad), dtype).at[2 * m, :n].set(g0_leaf)
    init = _FState(
        x=x0, f=f0, g=g0, A=A0, d=-g0_leaf,
        gnorm1=jnp.sum(jnp.abs(g0_leaf)),
        head=jnp.zeros((), jnp.int32), hlen=jnp.zeros((), jnp.int32),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pg0 <= opts.pgtol, CONV_GRAD, MAXITER).astype(
            jnp.int32),
        done=pg0 <= opts.pgtol)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        a_init = jnp.where(
            s.hlen == 0,
            jnp.minimum(jnp.asarray(1.0, dtype),
                        1.0 / jnp.maximum(s.gnorm1, 1e-300)),
            jnp.asarray(1.0, dtype))
        d_tree = jtu.tree_unflatten(tdef, [s.d])
        a, f_new, g_new, ls_nfev, ls_ok = _wolfe_line_search(
            value_and_grad, s.x, d_tree, s.f, s.g, a_init, big, opts)
        x_new = _axpy(a, d_tree, s.x)

        A, d_next, _good, pgn, gnorm1, head, hlen = fused_step(
            m, s.A, jtu.tree_leaves(s.x)[0], jtu.tree_leaves(x_new)[0],
            jtu.tree_leaves(s.g)[0], jtu.tree_leaves(g_new)[0],
            s.head, s.hlen, ls_ok)

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

        x_out = _where_s(fail, s.x, x_new)
        f_out = jnp.where(fail, s.f, f_new)
        g_out = _where_s(fail, s.g, g_new)
        return _FState(
            x=x_out, f=f_out, g=g_out, A=A, d=d_next, gnorm1=gnorm1,
            head=head, hlen=hlen, niter=s.niter + 1,
            nfev=s.nfev + ls_nfev, status=status, done=done)

    s = lax.while_loop(cond, body, init)
    pgn = _tmax_abs(s.g)
    return LBFGSResult(x=s.x, f=s.f, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=pgn)


def lbfgs_minimize(value_and_grad, x0, *, lower=None, upper=None,
                   opts: Optional[LBFGSOptions] = None) -> LBFGSResult:
    """Minimize ``f`` given ``value_and_grad(x) -> (f, g)`` from ``x0``,
    optionally subject to box bounds ``lower <= x <= upper``.

    ``x0`` may be any pytree of arrays; ``lower``/``upper`` a matching
    pytree (leaves broadcastable to x0's leaves) or None. Pure JAX:
    jit/vmap/scan/shard-safe. See module docstring for semantics.
    """
    opts = opts or LBFGSOptions()
    x0 = _tmap(jnp.asarray, x0)
    leaves = jtu.tree_leaves(x0)
    dtype = leaves[0].dtype
    m = opts.m
    bounded = (lower is not None) or (upper is not None)  # static
    flat = len(leaves) == 1 and leaves[0].ndim == 1
    direction = opts.direction
    if direction in ("auto", "compact_pallas"):
        from varanneal_tpu.kernels.dir_pallas import pallas_dir_supported
        direction = ("compact_pallas"
                     if pallas_dir_supported(leaves, m, dtype)
                     else "compact")
    algo = opts.bounded_algo
    if algo == "auto":
        # round-5 flip (was: 'subspace' for flat vectors): projection
        # everywhere — see the LBFGSOptions.bounded_algo note for the
        # paired-campaign + CPU measurements behind it
        algo = "projection"
    if bounded and algo == "subspace":
        if not flat:
            raise ValueError(
                "bounded_algo='subspace' requires a flat 1-D decision "
                "vector (pytrees keep the projection solver)")
        from varanneal_tpu.opt.lbfgsb import lbfgsb_minimize
        return lbfgsb_minimize(
            value_and_grad, leaves[0],
            lower=None if lower is None else jtu.tree_leaves(lower)[0],
            upper=None if upper is None else jtu.tree_leaves(upper)[0],
            opts=opts)
    if direction == "compact_pallas" and not bounded:
        # flat guaranteed by pallas_dir_supported; the fused per-
        # iteration Pallas step handles history+termination+direction
        return _lbfgs_fused_loop(value_and_grad, x0, opts, m, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    lower = (_tmap(lambda l: jnp.full(l.shape, -big, dtype), x0)
             if lower is None
             else _tmap(lambda lo, l: jnp.broadcast_to(
                 jnp.asarray(lo, dtype), l.shape), lower, x0))
    upper = (_tmap(lambda l: jnp.full(l.shape, big, dtype), x0)
             if upper is None
             else _tmap(lambda hi, l: jnp.broadcast_to(
                 jnp.asarray(hi, dtype), l.shape), upper, x0))

    x0 = _project(x0, lower, upper)
    f0, g0 = value_and_grad(x0)

    def hist0(t):
        return _tmap(lambda l: jnp.zeros((2 * m,) + l.shape, dtype), t)

    pg0 = _tmax_abs(_proj_grad(x0, g0, lower, upper))
    init = _State(
        x=x0, f=f0, g=g0, H=hist0(x0),
        rho=jnp.zeros((m,), dtype),
        head=jnp.zeros((), jnp.int32), hlen=jnp.zeros((), jnp.int32),
        niter=jnp.zeros((), jnp.int32), nfev=jnp.ones((), jnp.int32),
        status=jnp.where(pg0 <= opts.pgtol, CONV_GRAD, MAXITER).astype(
            jnp.int32),
        done=pg0 <= opts.pgtol)

    def cond(s):
        return ~s.done & (s.niter < opts.maxiter)

    def body(s):
        # ---- direction with bound-active components frozen -------------
        eps_b = jnp.asarray(1e-12, dtype)
        active = _tmap(
            lambda xi, gi, lo, hi: ((xi <= lo + eps_b) & (gi > 0))
            | ((xi >= hi - eps_b) & (gi < 0)),
            s.x, s.g, lower, upper)
        g_free = _tmap(lambda a, gi: jnp.where(a, 0.0, gi), active, s.g)
        dir_fn = (_compact_dir if direction == "compact"
                  else _pallas_dir if direction == "compact_pallas"
                  else _two_loop)
        d = dir_fn(g_free, s.H, s.rho, s.head, s.hlen, m, dtype)
        d = _tmap(lambda a, di: jnp.where(a, 0.0, di), active, d)
        descent = _tdot(s.g, d)
        bad_dir = (descent >= 0) | ~jnp.isfinite(descent)
        d = _where_s(bad_dir, _scale(-1.0, g_free), d)

        # ---- line search -------------------------------------------------
        gnorm1 = _treduce(lambda acc, l: acc + jnp.sum(jnp.abs(l)),
                          s.g, jnp.zeros((), dtype))
        a_init = jnp.where(
            s.hlen == 0,
            jnp.minimum(jnp.asarray(1.0, dtype),
                        1.0 / jnp.maximum(gnorm1, 1e-300)),
            jnp.asarray(1.0, dtype))
        if bounded:
            # projected-path Armijo backtracking (PQN): handles bound
            # crossings without capping the step
            x_new, f_new, g_new, ls_nfev, ls_ok = \
                _projected_backtracking_ls(
                    value_and_grad, s.x, d, s.f, s.g, a_init, lower,
                    upper, opts)
        else:
            a, f_new, g_new, ls_nfev, ls_ok = _wolfe_line_search(
                value_and_grad, s.x, d, s.f, s.g, a_init, big, opts)
            x_new = _axpy(a, d, s.x)

        # ---- history update (skip on tiny curvature) ---------------------
        sv = _tmap(lambda a_, b_: a_ - b_, x_new, s.x)
        yv = _tmap(lambda a_, b_: a_ - b_, g_new, s.g)
        sy = _tdot(sv, yv)
        s_nrm = jnp.sqrt(_tdot(sv, sv))
        y_nrm = jnp.sqrt(_tdot(yv, yv))
        good = ls_ok & (sy > 1e-10 * s_nrm * y_nrm) & (sy > 0)
        H = _hist_set_pair(s.H, m, s.head, sv, yv, good)
        rho = jnp.where(good,
                        s.rho.at[s.head].set(1.0 / jnp.maximum(sy, 1e-300)),
                        s.rho)
        head = jnp.where(good, (s.head + 1) % m, s.head)
        hlen = jnp.where(good, jnp.minimum(s.hlen + 1, m), s.hlen)

        # ---- termination --------------------------------------------------
        pgn = _tmax_abs(_proj_grad(x_new, g_new, lower, upper))
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

        # keep old point on line-search failure
        x_out = _where_s(fail, s.x, x_new)
        f_out = jnp.where(fail, s.f, f_new)
        g_out = _where_s(fail, s.g, g_new)
        return _State(
            x=x_out, f=f_out, g=g_out, H=H, rho=rho, head=head,
            hlen=hlen, niter=s.niter + 1, nfev=s.nfev + ls_nfev,
            status=status, done=done)

    s = lax.while_loop(cond, body, init)
    pgn = _tmax_abs(_proj_grad(s.x, s.g, lower, upper))
    return LBFGSResult(x=s.x, f=s.f, g=s.g, niter=s.niter, nfev=s.nfev,
                       status=s.status, pgnorm=pgn)
