"""Whole-SOLVE fused Pallas kernel: one launch per annealing rung.

The round-3 roofline (PARITY.md) pinned the small-problem regime's wall:
SERIALIZATION. Every prior fusion step shrank the per-iteration kernel
chain (fused direction, fused step, whole-problem action+grad) but the
floor stayed ~2 launches per L-BFGS iteration, each costing ~10-17 us of
fixed overhead against ~0.5 us of actual VPU work at the canonical bench
shape. This kernel is the endgame the roofline implies: the ENTIRE
unbounded L-BFGS inner solve — strong-Wolfe line search, two-loop
direction recursion, curvature-gated history, termination — runs INSIDE
one Pallas launch, with the action+gradient evaluated in-kernel via the
shared ``ag_pallas.build_fwd`` forward (``jax.vjp`` traced inside the
kernel). A full rung then costs ONE kernel launch; a 101-rung ladder
costs 101 launches total instead of ~2 x iterations x rungs.

Semantics mirror ``opt/lbfgs.py``'s generic loop with
``direction='two_loop'`` (the two-loop recursion is the natural in-kernel
form: only dots and axpys over the history, no (m, m) solves), the same
strong-Wolfe bracket/zoom state machine (one eval per step, cubic
interpolation, a_max cap semantics), the same curvature gate, and the
same termination statuses. Parity is tested in interpret mode against
the XLA solver on identical problems.

Decision-state layout inside the kernel (per member): the state block
(N_pad, D_pad) and the full parameter row (1, NP_pad) form a 2-leaf
vector; dots/axpys/norms act on both. Non-estimated parameters are
frozen by masking the parameter gradient with a host-built pidx mask —
their direction components are then identically zero and they never
move. History lives in VMEM scratch (m step/grad-diff pairs per leaf)
addressed by a dynamic leading index (circular buffer, no rolling
copies).

Supported (``solve_supported``): everything ``ag_supported`` allows,
UNBOUNDED solves, f32, and a VMEM budget check — the calibrated
(m + 45|64)-block footprint must fit. Members ride the Pallas grid
(custom_vmap), each paying only ITS OWN iteration count — unlike the
vmapped XLA while_loop where every member pays the slowest lane.

Reference semantics: the reference's per-rung call into SciPy's Fortran
L-BFGS-B (``varanneal/_autodiffmin.py :: min_lbfgs_scipy`` [M,
SURVEY.md §2]); this is its TPU-native extreme — the whole solve as one
fused device program.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from varanneal_tpu.ops.spec import ProblemSpec
from varanneal_tpu.kernels.ag_pallas import (
    ag_supported, build_fwd, embed_consts, make_prep, _pad_to)
from varanneal_tpu.opt.lbfgs import (
    LBFGSOptions, LBFGSResult, CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL)

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


# ---------------------------------------------------------------------------
# VMEM policy (round-4).
#
# Mosaic's default SCOPED-vmem budget is 16 MB — a scheduling budget,
# not the hardware (a v5e core has 128 MB of VMEM). Round-4 hardware
# probing showed the scoped-stack usage of this kernel is scheduler-
# dominated and NOT a clean per-block function of the shape (measured:
# 16.0–21.8 MB across N_pad 208→504, bounded AND unbounded SH — every
# shape just over the default limit), so the kernels now request a
# raised budget (``_VMEM_LIMIT``, via CompilerParams.vmem_limit_bytes)
# and the support predicate works in two layers:
#   1. the analytic block model (below) rejects clearly-impossible
#      shapes against a conservative fraction of the raised limit;
#   2. any shape whose prediction exceeds ``_PROBE_BYTES`` (~ where the
#      DEFAULT budget used to bite) is confirmed by a one-shot REAL
#      compile, cached per (shape, m, bounded, rf-rank) per process —
#      and across processes via the persistent JAX compilation cache.
# Small shapes — the bench and every campaign screen — stay purely
# analytic (no probe cost). This is the VERDICT r3 #8 self-calibration:
# a libtpu change shifts measured usage, the probe flips the predicate
# instead of crashing a ladder.
# ---------------------------------------------------------------------------

import os as _os

_VMEM_LIMIT = int(_os.environ.get("VARANNEAL_VMEM_LIMIT",
                                  100 * 2 ** 20))
_PROBE_BYTES = 12 * 2 ** 20
_probe_cache = {}


def _compiler_params():
    from jax.experimental.pallas import tpu as _pt
    return _pt.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _compile_kernel(spec, rf, opts, bounded):
    """Compile (not run) the whole-solve kernel for this problem shape.
    Raises on Mosaic scoped-memory OOM (or any other compile failure).
    Split out so tests can monkeypatch a simulated OOM."""
    import jax.numpy as jnp
    n = spec.n_state + spec.NPest
    lo = hi = None
    if bounded:
        lo = np.full(n, -1e6, np.float32)
        hi = np.full(n, 1e6, np.float32)
    solver = make_rung_solver(spec, opts, lower=lo, upper=hi)
    XP = jnp.zeros(n, jnp.float32)
    rf_c = jnp.asarray(np.asarray(rf, np.float32))
    jax.jit(solver).lower(XP, rf_c).compile()


# status codes that mean "the runtime/worker was unreachable", not
# "this program is uncompilable" — the ONLY failures a compile probe
# may treat as retryable
_TRANSIENT_CODES = ("UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED",
                    "CANCELLED")
_TRANSIENT_LIMIT = 3


def classify_probe_failure(e: BaseException) -> str:
    """Classify a compile-probe failure: ``'permanent'`` (cache the
    rejection) or ``'transient'`` (retry on the next query). Round-5
    hardening (VERDICT r4 weak #4): TYPE/CODE-first instead of OOM
    message substrings — a compile of a static program can only fail
    transiently through the PJRT transport (worker unreachable:
    UNAVAILABLE / DEADLINE_EXCEEDED / ... — jaxlib puts the canonical
    status-code token first in XlaRuntimeError messages); every other
    compiler rejection (RESOURCE_EXHAUSTED scoped-vmem OOM, Mosaic
    lowering errors, ...) is a property of the program shape and is
    PERMANENT. A jaxlib that rewords its OOM text therefore still
    caches the rejection instead of recompiling the failing kernel on
    every predicate query. Python-level errors in our own host code
    are programming errors — re-raise, never classify."""
    if isinstance(e, (TypeError, KeyError, AttributeError, IndexError)):
        raise e
    msg = str(e)
    name = type(e).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError") or isinstance(
            e, (RuntimeError, OSError, ValueError)):
        head = msg.lstrip().split(":", 1)[0].strip()
        if head in _TRANSIENT_CODES or any(
                c + ":" in msg[:200] for c in _TRANSIENT_CODES):
            return "transient"
        return "permanent"
    return "transient"


def _probe(cache, transients, key, compile_fn) -> bool:
    """Shared cached-compile-probe driver (also used by
    solve_pack_pallas). Permanent failures cache False; transient
    (worker-unreachable) failures retry on the next query, but after
    ``_TRANSIENT_LIMIT`` consecutive transient failures the key is
    capped to False anyway — a dead worker must not turn every
    predicate query into a multi-second compile attempt."""
    if key not in cache:
        try:
            compile_fn()
            cache[key] = True
            transients.pop(key, None)
        except Exception as e:
            if classify_probe_failure(e) == "permanent":
                cache[key] = False
            else:
                n = transients.get(key, 0) + 1
                transients[key] = n
                if n >= _TRANSIENT_LIMIT:
                    cache[key] = False
                return False
    return cache[key]


_transient_counts = {}


def _probe_ok(spec, rf, opts, bounded) -> bool:
    key = (spec.N_f, spec.D, spec.NP, spec.NPest, spec.disc,
           np.ndim(rf), opts.m, bool(bounded),
           spec.stim_f is not None)
    return _probe(_probe_cache, _transient_counts, key,
                  lambda: _compile_kernel(spec, rf, opts, bounded))


def solve_supported(spec: ProblemSpec, rf, opts: LBFGSOptions,
                    dtype=np.float32, bounded=False) -> bool:
    """Static predicate: the whole-solve kernel applies. Box-BOUNDED
    problems are served too (round-4): projection semantics in-kernel
    (active-set masked direction + projected-path Armijo), mirroring
    ``opt/lbfgs.py``'s ``bounded_algo='projection'`` — not the subspace
    L-BFGS-B, whose GCP/(m,m)-solve machinery does not pay at the small
    per-member sizes this kernel targets.

    VMEM policy (round 4, see the module-level block below): the
    kernels request a RAISED Mosaic scoped-vmem budget
    (``vmem_limit_bytes = _VMEM_LIMIT``, default 100 MB — the 16 MB
    default is a scheduling budget, not the v5e's 128 MB of VMEM), so
    shapes that OOM'd under the default (D=400/N=161: 18.52 MB at m=5,
    measured round 3; every probed SH shape at 16-21.8 MB, round 4)
    are served again — D=400 re-validated on hardware (probe clean,
    eval-for-eval parity, 30.6x vs the XLA loop at B=64). The analytic
    block model — (m + 45) blocks unbounded, (m + 64) bounded
    (measured round 4: bounded NaKL SH N_pad=504/m=5 reported
    16.66 MB) — is only a coarse gate against 0.8x the raised limit;
    anything predicted above ``_PROBE_BYTES`` is confirmed by the
    cached one-shot compile probe, because measured scoped usage is
    scheduler-dominated and not a clean function of shape."""
    if not ag_supported(spec, rf, dtype):
        return False
    if opts.m > 8:
        return False
    N_pad = _pad_to(spec.N_f, 8)
    D_pad = _pad_to(spec.D, 128)
    fixed = 64 if bounded else 45
    # VARANNEAL_VMEM_LIMIT=0 means "no CompilerParams" (legacy default
    # Mosaic budget), not "no budget"
    budget = int(0.8 * (_VMEM_LIMIT or 16 * 2 ** 20))
    # round-5: no (N_pad, N_pad) shift matrix any more — shifts are
    # O(N*D) slices (ag_pallas._shift_up)
    vmem = (opts.m + fixed) * N_pad * D_pad * 4
    if vmem > budget:
        return False
    if _INTERPRET[0]:      # test mode: interpreter runs anywhere
        return True
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:  # pragma: no cover
        return False
    if vmem > _PROBE_BYTES:
        # above the regime the DEFAULT Mosaic budget used to serve:
        # confirm with a one-shot real compile (cached) — measured
        # usage is scheduler-dominated and not hand-modelable here
        return _probe_ok(spec, rf, opts, bounded)
    return True


def solve_preferred(spec: ProblemSpec, rf, opts: LBFGSOptions,
                    dtype=np.float32, bounded=False) -> bool:
    """Measured-WIN predicate for ``solver='auto'``. Round-5: the
    in-kernel action's row shifts are O(N*D) slices (round 3/4 used
    O(N_pad^2 D) shift matmuls, which killed the win past N_pad ~ 300
    and gated this predicate at N_pad <= 256). Measured bounded
    NaKL-SH A/B at B=32 with the slice shifts: N_pad=168 (L96 trap):
    3.2x vs the generic projection loop; N_pad=304: 1.17x; N_pad=1008:
    1.03x (never below parity; 3.8-4.9x vs subspace throughout) — the
    gate now serves the kernel through N_pad <= 1024, the largest
    measured-at-least-parity shape. Past that the envelope is
    unmeasured (and the TPU compiler itself crashes on the N_pad=6008
    campaign-shape program — measured round-5, PARITY); campaign-length
    records stay on the generic loop. ``solver='fused'`` still FORCES
    the kernel anywhere :func:`solve_supported` holds."""
    return (solve_supported(spec, rf, opts, dtype=dtype,
                            bounded=bounded)
            and _pad_to(spec.N_f, 8) <= 1024)


def pick_rung_solver(spec: ProblemSpec, rf0, opts: LBFGSOptions, *,
                     solver="auto", lower=None, upper=None,
                     dtype=np.float32, compensated=False,
                     engine="auto", method="L-BFGS-B"):
    """THE solver='auto'/'fused' gate, shared by the facade
    (``api.Annealer.anneal``) and the staged workflow
    (``workflow.phase1``/``polish``) so the two entry points can never
    drift (round-5, VERDICT r4 #3). Returns a fused rung solver
    (:func:`make_rung_solver`) when the policy serves it, else None
    (generic loop). Policy (measured, PARITY.md):

    - ``solver='auto'``: fused only in the measured-WIN envelope
      (:func:`solve_preferred`); an explicit non-ag ``engine`` or an
      explicit ``bounded_algo='subspace'`` pins the generic loop
      (iterate-level reference parity); compensated actions are
      XLA-only.
    - ``solver='fused'``: forced anywhere :func:`solve_supported`
      holds; a warning (and the generic loop) otherwise.
    - ``solver='generic'``: always None.
    """
    if solver not in ("auto", "generic", "fused"):
        raise ValueError(f"solver must be auto/generic/fused, got "
                         f"{solver!r}")
    if solver == "generic":
        return None
    bounded_prob = lower is not None
    gate = solve_preferred if solver == "auto" else solve_supported
    ok = (method in ("L-BFGS-B", "LBFGS")
          and not compensated
          and gate(spec, rf0, opts, dtype=dtype, bounded=bounded_prob))
    if ok and solver == "auto" and engine not in ("auto", "ag"):
        # the fused solver evaluates the action via its in-kernel ag
        # vag; honor an explicit different engine choice
        ok = False
    if ok and bounded_prob and opts.bounded_algo == "subspace":
        # DELIBERATE policy (round 4, VERDICT r3 #1): under the default
        # bounded_algo='auto', a bounded problem in the fused envelope
        # runs the PROJECTION algorithm in-kernel (measured: identical
        # basin statistics, 3.2-31.9x wall vs the generic solvers in
        # the win regime — PARITY bounded A/B); both algorithms
        # converge to the same minima but take different iterates. An
        # EXPLICIT bounded_algo='subspace' pins the full L-BFGS-B
        # (generic) for iterate-level reference parity.
        ok = False
    if ok:
        return make_rung_solver(spec, opts, lower=lower, upper=upper)
    if solver == "fused":
        import warnings
        warnings.warn(
            "solver='fused' unsupported for this problem (dtype / disc "
            "/ VMEM envelope / backend / compensated / explicit "
            "subspace bounds); using the generic solver", stacklevel=3)
    return None


def _cubic_min(a, fa, dfa, b, fb, dfb):
    """Minimizer of the cubic Hermite interpolant on [a, b]; NaN-safe
    fallback to bisection (mirrors opt/lbfgs.py::_cubic_min)."""
    d1 = dfa + dfb - 3.0 * (fa - fb) / (a - b)
    arg = d1 * d1 - dfa * dfb
    d2 = jnp.sqrt(jnp.maximum(arg, 0.0)) * jnp.sign(b - a)
    denom = dfb - dfa + 2.0 * d2
    t = b - (b - a) * (dfb + d2 - d1) / denom
    bad = (arg < 0.0) | ~jnp.isfinite(t) | (denom == 0.0)
    return jnp.where(bad, 0.5 * (a + b), t)


def _solve_one(opts, fwd, pmask, scratch, bnd_vals, X0, p0):
    """The full single-rung L-BFGS solve (closures + init + while loop)
    on in-kernel VMEM values — the shared core of ``_solve_kernel``
    (one rung per launch) and ``_ladder_kernel`` (k warm-started rungs
    per launch, round-5). ``scratch``: the (Sx, Yx, Sp, Yp) history
    refs; ``bnd_vals``: (loX, hiX, loP, hiP) VMEM values for the
    bounded projection algorithm, or None. Returns
    (X, p, f, gX, gp, pgn, niter, nfev, status)."""
    Sx_ref, Yx_ref, Sp_ref, Yp_ref = scratch
    m = opts.m
    dtype = X0.dtype
    N_pad, D_pad = X0.shape
    bounded = bnd_vals is not None
    if bounded:
        loX, hiX, loP, hiP = bnd_vals
    one = jnp.ones((), dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    tiny_den = jnp.asarray(1e-30, dtype)
    c1 = jnp.asarray(opts.c1, dtype)
    c2 = jnp.asarray(opts.c2, dtype)
    pgtol = jnp.asarray(opts.pgtol, dtype)
    ftol = jnp.asarray(opts.ftol, dtype)
    m_i = jnp.asarray(m, jnp.int32)

    def vag(Xv, pv):
        val, vjp = jax.vjp(fwd, Xv, pv)
        gX, gp = vjp(one)
        return val, gX, gp * pmask          # frozen params never move

    def tdot(ax, ap, bx, bp):
        return jnp.sum(ax * bx) + jnp.sum(ap * bp)

    def tmax_abs(ax, ap):
        return jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(ap)))

    if bounded:
        def proj(Xv, pv):
            return jnp.clip(Xv, loX, hiX), jnp.clip(pv, loP, hiP)

        def pg_max(Xv, pv, gXv, gpv):
            # SciPy's projected gradient x - P(x - g); zero on padded /
            # frozen entries (their g is 0 and their bounds are +-inf)
            return tmax_abs(Xv - jnp.clip(Xv - gXv, loX, hiX),
                            pv - jnp.clip(pv - gpv, loP, hiP))

        def free_masks(Xv, pv, gXv, gpv):
            # active-set freeze, mirroring opt/lbfgs.py: a component at a
            # bound with the gradient pushing OUT of the box is frozen
            eps_b = jnp.asarray(1e-12, dtype)
            aX = (((Xv <= loX + eps_b) & (gXv > 0))
                  | ((Xv >= hiX - eps_b) & (gXv < 0)))
            ap_ = (((pv <= loP + eps_b) & (gpv > 0))
                   | ((pv >= hiP - eps_b) & (gpv < 0)))
            return 1.0 - aX.astype(dtype), 1.0 - ap_.astype(dtype)

    # ---- two-loop recursion over the scratch history -------------------
    def direction(gX, gp, head, hlen, fX=None, fp=None):
        qX, qp = gX, gp
        ks = []
        for k in range(m):
            idx = jnp.mod(head - 1 - k, m_i)
            valid = (k < hlen).astype(dtype)
            sX = Sx_ref[idx]
            sp = Sp_ref[idx]
            yX = Yx_ref[idx]
            yp = Yp_ref[idx]
            sy = tdot(sX, sp, yX, yp)
            rho = valid / jnp.maximum(sy, tiny_den)
            a_k = rho * tdot(sX, sp, qX, qp)
            qX = qX - a_k * yX
            qp = qp - a_k * yp
            ks.append((a_k, rho, idx))
        idx_n = jnp.mod(head - 1, m_i)
        sXn, spn = Sx_ref[idx_n], Sp_ref[idx_n]
        yXn, ypn = Yx_ref[idx_n], Yp_ref[idx_n]
        sy_n = tdot(sXn, spn, yXn, ypn)
        yy_n = tdot(yXn, ypn, yXn, ypn)
        gamma = jnp.where(hlen > 0, sy_n / jnp.maximum(yy_n, tiny_den),
                          one)
        qX = gamma * qX
        qp = gamma * qp
        for a_k, rho, idx in reversed(ks):
            sX, sp = Sx_ref[idx], Sp_ref[idx]
            yX, yp = Yx_ref[idx], Yp_ref[idx]
            beta = rho * tdot(yX, yp, qX, qp)
            qX = qX + (a_k - beta) * sX
            qp = qp + (a_k - beta) * sp
        dX, dp = -qX, -qp
        if fX is not None:     # bound-active components frozen out
            dX = dX * fX
            dp = dp * fp
        desc = tdot(dX, dp, gX, gp)
        bad = (desc >= 0) | ~jnp.isfinite(desc)
        return (jnp.where(bad, -gX, dX), jnp.where(bad, -gp, dp))

    # ---- strong-Wolfe line search (mirrors opt/lbfgs.py) ---------------
    def line_search(xX, xp, dX, dp, f0, gX0, gp0, a_init):
        dphi0 = tdot(gX0, gp0, dX, dp)
        zero = jnp.zeros((), dtype)
        # carry: stage, done, failed, i, a, a_prev, f_prev, d_prev,
        #        a_lo, f_lo, d_lo, a_hi, f_hi, d_hi, a_star, f_star,
        #        gX_star, gp_star
        init = (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                jnp.minimum(a_init, big), zero, f0, dphi0,
                zero, f0, dphi0, zero, f0, dphi0,
                zero, f0, gX0, gp0)

        def cond(s):
            return ~(s[1] | s[2]) & (s[3] < opts.maxls)

        def body(s):
            (stage, done, failed, i, a, a_prev, f_prev, d_prev,
             a_lo, f_lo, d_lo, a_hi, f_hi, d_hi,
             a_star, f_star, gX_star, gp_star) = s
            f_a, gX_a, gp_a = vag(xX + a * dX, xp + a * dp)
            dphi_a = tdot(gX_a, gp_a, dX, dp)
            i = i + 1
            armijo_fail = (f_a > f0 + c1 * a * dphi0)
            nan_bad = ~jnp.isfinite(f_a)
            curv_ok = jnp.abs(dphi_a) <= -c2 * dphi0
            in_br = stage == 0

            at_cap = a >= big
            hi_b = armijo_fail | ((i > 1) & (f_a >= f_prev)) | nan_bad
            accept_b = ~hi_b & (curv_ok | at_cap)
            to_zoom_rev = ~hi_b & ~curv_ok & ~at_cap & (dphi_a >= 0)
            enter_zoom = hi_b | to_zoom_rev
            a_lo_b = jnp.where(hi_b, a_prev, a)
            f_lo_b = jnp.where(hi_b, f_prev, f_a)
            d_lo_b = jnp.where(hi_b, d_prev, dphi_a)
            a_hi_b = jnp.where(hi_b, a, a_prev)
            f_hi_b = jnp.where(hi_b, f_a, f_prev)
            d_hi_b = jnp.where(hi_b, dphi_a, d_prev)

            hi_z = armijo_fail | (f_a >= f_lo) | nan_bad
            accept_z = ~hi_z & curv_ok
            swap = ~hi_z & ~curv_ok & (dphi_a * (a_hi - a_lo) >= 0)
            a_hi_z = jnp.where(hi_z, a, jnp.where(swap, a_lo, a_hi))
            f_hi_z = jnp.where(hi_z, f_a, jnp.where(swap, f_lo, f_hi))
            d_hi_z = jnp.where(hi_z, dphi_a, jnp.where(swap, d_lo, d_hi))
            a_lo_z = jnp.where(hi_z, a_lo, a)
            f_lo_z = jnp.where(hi_z, f_lo, f_a)
            d_lo_z = jnp.where(hi_z, d_lo, dphi_a)

            a_lo_n = jnp.where(in_br, a_lo_b, a_lo_z)
            f_lo_n = jnp.where(in_br, f_lo_b, f_lo_z)
            d_lo_n = jnp.where(in_br, d_lo_b, d_lo_z)
            a_hi_n = jnp.where(in_br, a_hi_b, a_hi_z)
            f_hi_n = jnp.where(in_br, f_hi_b, f_hi_z)
            d_hi_n = jnp.where(in_br, d_hi_b, d_hi_z)
            width = jnp.abs(a_hi_n - a_lo_n)
            a_interp = _cubic_min(a_lo_n, f_lo_n, d_lo_n,
                                  a_hi_n, f_hi_n, d_hi_n)
            a_interp = jnp.clip(
                a_interp,
                jnp.minimum(a_lo_n, a_hi_n) + 0.1 * width,
                jnp.maximum(a_lo_n, a_hi_n) - 0.1 * width)
            a_expand = jnp.minimum(2.0 * a, big)
            a_next = jnp.where(in_br & ~enter_zoom, a_expand, a_interp)
            tiny = width <= 1e-14 * jnp.maximum(one, jnp.abs(a_lo_n))
            accept = jnp.where(in_br, accept_b, accept_z)
            failed_n = jnp.where(in_br, nan_bad & (i >= opts.maxls),
                                 tiny & ~accept)
            # i32-typed branch consts: python ints make the where weak-i64
            # under x64, and Mosaic's i64->i32 convert recurses forever
            # (CLAUDE.md lowering pitfalls)
            stage_n = jnp.where(in_br & ~enter_zoom, jnp.int32(0),
                                jnp.int32(1))
            return (stage_n, accept, failed_n, i, a_next,
                    a, jnp.where(in_br, f_a, f_prev),
                    jnp.where(in_br, dphi_a, d_prev),
                    a_lo_n, f_lo_n, d_lo_n, a_hi_n, f_hi_n, d_hi_n,
                    jnp.where(accept, a, a_star),
                    jnp.where(accept, f_a, f_star),
                    jnp.where(accept, gX_a, gX_star),
                    jnp.where(accept, gp_a, gp_star))

        s = lax.while_loop(cond, body, init)
        (stage, done, failed, i, a, a_prev, f_prev, d_prev,
         a_lo, f_lo, d_lo, a_hi, f_hi, d_hi,
         a_star, f_star, gX_star, gp_star) = s

        have_lo = (a_lo > 0) & (f_lo < f0)
        ok = done | have_lo
        # fallback eval at a_lo (Armijo holds there by construction),
        # only when no Wolfe point was accepted
        need_lo = ~done & have_lo
        f_lo_e, gX_lo_e, gp_lo_e = lax.cond(
            need_lo,
            lambda: vag(xX + a_lo * dX, xp + a_lo * dp),
            lambda: (f0, gX0, gp0))
        a_out = jnp.where(done, a_star, jnp.where(have_lo, a_lo,
                                                  jnp.zeros((), dtype)))
        f_out = jnp.where(done, f_star, jnp.where(have_lo, f_lo_e, f0))
        gX_out = jnp.where(done, gX_star,
                           jnp.where(have_lo, gX_lo_e, gX0))
        gp_out = jnp.where(done, gp_star,
                           jnp.where(have_lo, gp_lo_e, gp0))
        nfev = i + jnp.where(done | ~have_lo, jnp.int32(0), jnp.int32(1))
        return a_out, f_out, gX_out, gp_out, nfev, ok

    # ---- projected-path Armijo backtracking (bounded only) -------------
    # Mirrors opt/lbfgs.py::_projected_backtracking_ls: trial points are
    # P(x + a d); sufficient decrease against g0.(P(x+a d) - x). The
    # accept test rides the while cond (recomputed from the carry) so the
    # body stays a single unconditional vag eval — no lax.cond with block
    # operands in the Mosaic hot loop.
    def proj_ls(xX, xp, dX, dp, f0, gX0, gp0, a_init):
        def trial(a):
            return proj(xX + a * dX, xp + a * dp)

        def armijo_ok(X_a, p_a, f_a):
            gdx = tdot(gX0, gp0, X_a - xX, p_a - xp)
            return ((f_a <= f0 + c1 * gdx) & jnp.isfinite(f_a)
                    & (f_a < f0))

        a0 = jnp.asarray(a_init, dtype)
        X_t, p_t = trial(a0)
        f_t, gX_t, gp_t = vag(X_t, p_t)
        # carry: i, a, X_a, p_a, f_a, gX_a, gp_a
        init = (jnp.ones((), jnp.int32), a0, X_t, p_t, f_t, gX_t, gp_t)

        def cond(s):
            i, a, X_a, p_a, f_a = s[0], s[1], s[2], s[3], s[4]
            return ~armijo_ok(X_a, p_a, f_a) & (i < opts.maxls)

        def body(s):
            i, a = s[0], s[1]
            a_n = 0.5 * a
            X_n, p_n = trial(a_n)
            f_n, gX_n, gp_n = vag(X_n, p_n)
            return (i + 1, a_n, X_n, p_n, f_n, gX_n, gp_n)

        i, a, X_a, p_a, f_a, gX_a, gp_a = lax.while_loop(cond, body, init)
        ok = armijo_ok(X_a, p_a, f_a)
        X_new = jnp.where(ok, X_a, xX)
        p_new = jnp.where(ok, p_a, xp)
        f_new = jnp.where(ok, f_a, f0)
        gX_new = jnp.where(ok, gX_a, gX0)
        gp_new = jnp.where(ok, gp_a, gp0)
        return X_new, p_new, f_new, gX_new, gp_new, i, ok

    # ---- init -----------------------------------------------------------
    if bounded:
        X0, p0 = proj(X0, p0)     # feasible start, as the generic loop
    f0, gX0, gp0 = vag(X0, p0)
    if bounded:
        pg0 = pg_max(X0, p0, gX0, gp0)
        fX0, fp0 = free_masks(X0, p0, gX0, gp0)
        d0X, d0p = -gX0 * fX0, -gp0 * fp0
    else:
        pg0 = tmax_abs(gX0, gp0)
        d0X, d0p = -gX0, -gp0
    gn1_0 = jnp.sum(jnp.abs(gX0)) + jnp.sum(jnp.abs(gp0))
    done0 = pg0 <= pgtol
    status0 = jnp.where(done0, jnp.int32(CONV_GRAD), jnp.int32(MAXITER))

    # zero the history scratch (persistent VMEM is uninitialized)
    for k in range(m):
        ki = jnp.asarray(k, jnp.int32)
        Sx_ref[ki] = jnp.zeros((N_pad, D_pad), dtype)
        Yx_ref[ki] = jnp.zeros((N_pad, D_pad), dtype)
        Sp_ref[ki] = jnp.zeros((1, Sp_ref.shape[-1]), dtype)
        Yp_ref[ki] = jnp.zeros((1, Yp_ref.shape[-1]), dtype)

    # carry: X, p, f, gX, gp, dX, dp, gnorm1, head, hlen, niter, nfev,
    #        status, done
    init = (X0, p0, f0, gX0, gp0, d0X, d0p, gn1_0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32),
            status0, done0)

    def cond(s):
        return ~s[13] & (s[10] < opts.maxiter)

    def body(s):
        (X, p, f, gX, gp, dX, dp, gnorm1, head, hlen, niter, nfev,
         status, done) = s
        a_init = jnp.where(
            hlen == 0,
            jnp.minimum(one, 1.0 / jnp.maximum(gnorm1, tiny_den)), one)
        if bounded:
            (X_new, p_new, f_new, gX_new, gp_new, ls_nfev,
             ls_ok) = proj_ls(X, p, dX, dp, f, gX, gp, a_init)
        else:
            a, f_new, gX_new, gp_new, ls_nfev, ls_ok = line_search(
                X, p, dX, dp, f, gX, gp, a_init)
            X_new = X + a * dX
            p_new = p + a * dp

        # curvature-gated history write at the head slot
        sX = X_new - X
        sp = p_new - p
        yX = gX_new - gX
        yp = gp_new - gp
        sy = tdot(sX, sp, yX, yp)
        s2 = tdot(sX, sp, sX, sp)
        y2 = tdot(yX, yp, yX, yp)
        good = ls_ok & (sy > 1e-10 * jnp.sqrt(s2 * y2)) & (sy > 0)
        gf = good.astype(dtype)
        Sx_ref[head] = gf * sX + (1.0 - gf) * Sx_ref[head]
        Yx_ref[head] = gf * yX + (1.0 - gf) * Yx_ref[head]
        Sp_ref[head] = gf * sp + (1.0 - gf) * Sp_ref[head]
        Yp_ref[head] = gf * yp + (1.0 - gf) * Yp_ref[head]
        head_n = jnp.where(good, jnp.mod(head + 1, m_i), head)
        hlen_n = jnp.where(good, jnp.minimum(hlen + 1, m), hlen)

        pgn = (pg_max(X_new, p_new, gX_new, gp_new) if bounded
               else tmax_abs(gX_new, gp_new))
        gn1 = jnp.sum(jnp.abs(gX_new)) + jnp.sum(jnp.abs(gp_new))
        df = f - f_new
        fden = jnp.maximum(jnp.maximum(jnp.abs(f), jnp.abs(f_new)), one)
        conv_g = pgn <= pgtol
        conv_f = df <= ftol * fden
        fail = ~ls_ok
        done_n = conv_g | conv_f | fail
        status_n = jnp.where(
            conv_g, jnp.int32(CONV_GRAD),
            jnp.where(fail, jnp.int32(LS_FAIL),
                      jnp.where(conv_f, jnp.int32(CONV_FTOL),
                                jnp.int32(MAXITER))))

        if bounded:
            fXm, fpm = free_masks(X_new, p_new, gX_new, gp_new)
            dX_n, dp_n = direction(gX_new * fXm, gp_new * fpm,
                                   head_n, hlen_n, fXm, fpm)
        else:
            dX_n, dp_n = direction(gX_new, gp_new, head_n, hlen_n)
        X_out = jnp.where(fail, X, X_new)
        p_out = jnp.where(fail, p, p_new)
        f_out = jnp.where(fail, f, f_new)
        gX_out = jnp.where(fail, gX, gX_new)
        gp_out = jnp.where(fail, gp, gp_new)
        return (X_out, p_out, f_out, gX_out, gp_out, dX_n, dp_n, gn1,
                head_n, hlen_n, niter + 1, nfev + ls_nfev, status_n,
                done_n)

    s = lax.while_loop(cond, body, init)
    (X, p, f, gX, gp, dX, dp, gnorm1, head, hlen, niter, nfev,
     status, done) = s
    pgn = pg_max(X, p, gX, gp) if bounded else tmax_abs(gX, gp)
    return X, p, f, gX, gp, pgn, niter, nfev, status


def _solve_kernel(spec, has_stim, rf_mode, opts, bounded, *refs):
    """One member: the full L-BFGS solve. Ref order:
      X_ref (1, N_pad, D_pad), p_ref (1, 1, NP_pad),
      pm_ref (1, 1, NP_pad) estimated-parameter 0/1 mask,
      [bounded only: loX/hiX (1, N_pad, D_pad), loP/hiP (1, 1, NP_pad)
       shared, padded/frozen entries +-inf],
      rf refs per mode (scalar SMEM (1, 1, 1) | diag blocks),
      y_ref, w_ref (1, N_pad, D_pad) shared, stimulus refs,
      -> Xo_ref, po_ref, gxo_ref, gpo_ref, s_ref (1, 1, 128)
         [f, pgnorm, niter, nfev, status],
      scratch: Sx (m, N_pad, D_pad), Yx (m, N_pad, D_pad),
               Sp (m, 1, NP_pad), Yp (m, 1, NP_pad).
    """
    m = opts.m
    sh = spec.disc == "SimpsonHermite"
    n_rf = 2 if rf_mode == "diag_sh" else 1
    n_st = (3 if sh else 2) if has_stim else 0
    refs = list(refs)
    X_ref = refs.pop(0)
    p_ref = refs.pop(0)
    pm_ref = refs.pop(0)
    if bounded:
        loX_ref = refs.pop(0)
        hiX_ref = refs.pop(0)
        loP_ref = refs.pop(0)
        hiP_ref = refs.pop(0)
    rf_refs = [refs.pop(0) for _ in range(n_rf)]
    y_ref = refs.pop(0)
    w_ref = refs.pop(0)
    st_refs = [refs.pop(0) for _ in range(n_st)]
    Xo_ref, po_ref, gxo_ref, gpo_ref, s_ref = refs[:5]
    Sx_ref, Yx_ref, Sp_ref, Yp_ref = refs[5:]

    X0 = X_ref[0]
    dtype = X0.dtype
    N_pad, D_pad = X0.shape
    S_w = spec.stim_f.shape[1] if has_stim else 0
    svals = [r[0][:, :S_w] for r in st_refs]
    rf_vals = ([rf_refs[0][0, 0, 0]] if rf_mode == "scalar"
               else [r[0] for r in rf_refs])
    fwd = build_fwd(spec, has_stim, rf_mode, rf_vals, y_ref[0], w_ref[0],
                    svals, N_pad, D_pad, dtype)
    pmask = pm_ref[0]                              # (1, NP_pad)

    bnd_vals = ((loX_ref[0], hiX_ref[0], loP_ref[0], hiP_ref[0])
                if bounded else None)
    (X, p, f, gX, gp, pgn, niter, nfev,
     status) = _solve_one(opts, fwd, pmask,
                          (Sx_ref, Yx_ref, Sp_ref, Yp_ref),
                          bnd_vals, X0, p_ref[0])

    Xo_ref[0] = X
    po_ref[0] = p
    gxo_ref[0] = gX
    gpo_ref[0] = gp
    cc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    s_ref[0] = ((cc == 0).astype(dtype) * f
                + (cc == 1).astype(dtype) * pgn
                + (cc == 2).astype(dtype) * niter.astype(dtype)
                + (cc == 3).astype(dtype) * nfev.astype(dtype)
                + (cc == 4).astype(dtype) * status.astype(dtype))


def _solve_batched(spec, has_stim, rf_mode, rf_shared, opts,
                   X, p2, pm, rf_args, yv, wv, sts, bnds=None):
    """X (B, N_pad, D_pad), p2/pm (B, 1, NP_pad); rf/constants as in
    ag_pallas._ag_batched; ``bnds`` the shared (loX, hiX, loP, hiP)
    bound blocks or None. Returns (Xo, po, gxo, gpo, s)."""
    B, N_pad, D_pad = X.shape
    NP_pad = p2.shape[-1]
    m = opts.m
    bounded = bnds is not None
    kern = functools.partial(_solve_kernel, spec, has_stim, rf_mode, opts,
                             bounded)
    vmem = pltpu.VMEM

    def per_member(shp):
        return pl.BlockSpec(shp,
                            lambda b: (b,) + (b * 0,) * (len(shp) - 1),
                            memory_space=vmem)

    shared3 = pl.BlockSpec((1, N_pad, D_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    sharedp = pl.BlockSpec((1, 1, NP_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    in_specs = [per_member((1, N_pad, D_pad)),
                per_member((1, 1, NP_pad)),
                per_member((1, 1, NP_pad))]
    if bounded:
        in_specs += [shared3, shared3, sharedp, sharedp]
    if rf_mode == "scalar":
        in_specs.append(pl.BlockSpec((1, 1, 1),
                                     lambda b: (b, b * 0, b * 0),
                                     memory_space=pltpu.SMEM))
    else:
        for _ in rf_args:
            in_specs.append(shared3 if rf_shared
                            else per_member((1, N_pad, D_pad)))
    in_specs += [shared3, shared3]
    args = ([X, p2, pm] + (list(bnds) if bounded else [])
            + list(rf_args) + [yv, wv])
    if has_stim:
        S_pad = sts[0].shape[-1]
        sshared = pl.BlockSpec((1, N_pad, S_pad),
                               lambda b: (b * 0, b * 0, b * 0),
                               memory_space=vmem)
        in_specs += [sshared] * len(sts)
        args += list(sts)
    out_specs = [
        per_member((1, N_pad, D_pad)),
        per_member((1, 1, NP_pad)),
        per_member((1, N_pad, D_pad)),
        per_member((1, 1, NP_pad)),
        per_member((1, 1, 128)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, 128), X.dtype),
    ]
    scratch = [
        pltpu.VMEM((m, N_pad, D_pad), X.dtype),
        pltpu.VMEM((m, N_pad, D_pad), X.dtype),
        pltpu.VMEM((m, 1, NP_pad), X.dtype),
        pltpu.VMEM((m, 1, NP_pad), X.dtype),
    ]
    kw = {}
    if not _INTERPRET[0] and _VMEM_LIMIT > 0:
        kw["compiler_params"] = _compiler_params()
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=_INTERPRET[0], **kw)(*args)


def make_rung_solver(spec: ProblemSpec, opts: LBFGSOptions,
                     lower=None, upper=None):
    """Build ``solve(XP, rf) -> LBFGSResult`` running the whole L-BFGS
    inner solve in one Pallas launch (per member under vmap). Drop-in
    for the ``run_ladder(..., rung_solver=)`` hook; only valid where
    :func:`solve_supported`.

    ``lower``/``upper``: optional flat bound vectors in the packed XP
    layout (as built by ``api.build_bounds``) — the kernel then runs the
    PROJECTION bounded algorithm (opt/lbfgs.py ``bounded_algo=
    'projection'`` semantics) entirely in-kernel. Padded rows/cols and
    frozen parameters get +-inf bounds so clipping never moves them."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    N_pad, D_pad, NP_pad, yv, wv, sts = embed_consts(spec)
    has_stim = spec.stim_f is not None
    n_st = len(sts)
    _prep = make_prep(spec, N_pad, D_pad, NP_pad)
    pmask_np = np.zeros((1, NP_pad), np.float32)
    if spec.NPest:
        pmask_np[0, np.asarray(spec.pidx, np.int64)] = 1.0
    pmask = jnp.asarray(pmask_np)
    pcols = (np.asarray(spec.pidx, dtype=np.int32)
             if spec.NPest else None)

    bounded = lower is not None or upper is not None
    bnds = ()
    if bounded:
        n = spec.n_state + spec.NPest
        lo = (np.full(n, -np.inf) if lower is None
              else np.asarray(lower, np.float64))
        hi = (np.full(n, np.inf) if upper is None
              else np.asarray(upper, np.float64))
        loX_e = np.full((N_pad, D_pad), -np.inf, np.float32)
        hiX_e = np.full((N_pad, D_pad), np.inf, np.float32)
        loX_e[:N_f, :D] = lo[: spec.n_state].reshape(N_f, D)
        hiX_e[:N_f, :D] = hi[: spec.n_state].reshape(N_f, D)
        loP_e = np.full((1, NP_pad), -np.inf, np.float32)
        hiP_e = np.full((1, NP_pad), np.inf, np.float32)
        if spec.NPest:
            loP_e[0, np.asarray(spec.pidx, np.int64)] = lo[spec.n_state:]
            hiP_e[0, np.asarray(spec.pidx, np.int64)] = hi[spec.n_state:]
        bnds = (jnp.asarray(loX_e)[None], jnp.asarray(hiX_e)[None],
                jnp.asarray(loP_e)[None], jnp.asarray(hiP_e)[None])

    _cache = {}

    def _get_fn(rf_mode):
        if rf_mode in _cache:
            return _cache[rf_mode]
        n_rf = 2 if rf_mode == "diag_sh" else 1

        @jax.custom_batching.custom_vmap
        def solve_fn(Xp, p2, pm, *rest):
            rf_args = [r[None] for r in rest[:n_rf]]
            cy, cw = rest[n_rf], rest[n_rf + 1]
            sts_c = rest[n_rf + 2: n_rf + 2 + n_st]
            bnds_c = rest[n_rf + 2 + n_st:]
            outs = _solve_batched(spec, has_stim, rf_mode, False, opts,
                                  Xp[None], p2[None], pm[None], rf_args,
                                  cy, cw, sts_c,
                                  bnds_c if bounded else None)
            return tuple(o[0] for o in outs)

        @solve_fn.def_vmap
        def _solve_vmap(axis_size, in_batched, Xp, p2, pm, *rest):
            B = axis_size

            def bc(v, isb):
                return v if isb else jnp.broadcast_to(
                    v[None], (B,) + v.shape)

            rf_in = rest[:n_rf]
            rf_b = in_batched[3: 3 + n_rf]
            consts = [c[0] if isb else c
                      for c, isb in zip(rest[n_rf:],
                                        in_batched[3 + n_rf:])]
            cy, cw = consts[0], consts[1]
            Xp = bc(Xp, in_batched[0])
            p2 = bc(p2, in_batched[1])
            pm = bc(pm, in_batched[2])
            rf_shared = rf_mode != "scalar" and not any(rf_b)
            if rf_shared:
                rf_args = [r[None] for r in rf_in]
            else:
                rf_args = [bc(r, isb) for r, isb in zip(rf_in, rf_b)]
            outs = _solve_batched(spec, has_stim, rf_mode, rf_shared,
                                  opts, Xp, p2, pm, rf_args, cy, cw,
                                  consts[2: 2 + n_st],
                                  tuple(consts[2 + n_st:]) if bounded
                                  else None)
            return outs, tuple(True for _ in outs)

        def call(Xp, p2, rf_args):
            return solve_fn(Xp, p2, pmask, *rf_args, yv, wv, *sts,
                            *bnds)

        _cache[rf_mode] = call
        return call

    def solve(XP, rf):
        Xp, p2, rf_args, mode = _prep(XP, rf)
        Xo, po, gxo, gpo, srow = _get_fn(mode)(Xp, p2, rf_args)
        x_flat = Xo[:N_f, :D].reshape(-1)
        g_flat = gxo[:N_f, :D].reshape(-1)
        if spec.NPest:
            x_flat = jnp.concatenate([x_flat, po[0, pcols]])
            g_flat = jnp.concatenate([g_flat, gpo[0, pcols]])
        return LBFGSResult(
            x=x_flat, f=srow[0, 0], g=g_flat,
            niter=srow[0, 2].astype(jnp.int32),
            nfev=srow[0, 3].astype(jnp.int32),
            status=srow[0, 4].astype(jnp.int32),
            pgnorm=srow[0, 1])

    return solve


# ---------------------------------------------------------------------------
# k-rung fused LADDER kernel (round-5, VERDICT r4 #8): k warm-started
# rungs in ONE launch. The per-rung fused solver already collapsed a
# rung to one launch; this removes the remaining per-rung kernel
# boundary + host-side prep/unpack/records chains at the bench shape.
# Scalar-rf UNBOUNDED solves only (the bench regime).
# ---------------------------------------------------------------------------

def ladder_supported(spec: ProblemSpec, rf, opts: LBFGSOptions,
                     dtype=np.float32, n_rungs: int = 1) -> bool:
    """Predicate for the k-rung fused ladder kernel: the whole-solve
    envelope, scalar rf, unbounded. One launch runs n_rungs solves
    back-to-back — keep the per-launch wall under this testbed's ~60 s
    dispatch kill by chunking rungs at the caller."""
    return (np.ndim(rf) == 0
            and solve_supported(spec, rf, opts, dtype=dtype,
                                bounded=False))


def _ladder_kernel(spec, has_stim, opts, k, *refs):
    """One member: k warm-started rungs. Ref order:
      X_ref (1, N_pad, D_pad), p_ref (1, 1, NP_pad),
      pm_ref (1, 1, NP_pad), rf_ref (1, 1, k) SMEM per-rung rf values,
      y_ref, w_ref (1, N_pad, D_pad) shared, stimulus refs,
      -> Xo_ref, po_ref, rec_ref (1, K8, 128) with per-rung rows
         [f, me, pgnorm, niter, nfev, status],
      scratch: the _solve_kernel history blocks."""
    sh = spec.disc == "SimpsonHermite"
    n_st = (3 if sh else 2) if has_stim else 0
    refs = list(refs)
    X_ref = refs.pop(0)
    p_ref = refs.pop(0)
    pm_ref = refs.pop(0)
    rf_ref = refs.pop(0)
    y_ref = refs.pop(0)
    w_ref = refs.pop(0)
    st_refs = [refs.pop(0) for _ in range(n_st)]
    Xo_ref, po_ref, rec_ref = refs[:3]
    scratch = tuple(refs[3:])

    X0 = X_ref[0]
    dtype = X0.dtype
    N_pad, D_pad = X0.shape
    S_w = spec.stim_f.shape[1] if has_stim else 0
    svals = [r[0][:, :S_w] for r in st_refs]
    pmask = pm_ref[0]
    K8 = rec_ref.shape[1]
    me_norm = jnp.asarray(1.0 / (spec.L * spec.N_data), dtype)
    W = w_ref[0]
    Y = y_ref[0]
    ri = lax.broadcasted_iota(jnp.int32, (K8, 128), 0)
    ci = lax.broadcasted_iota(jnp.int32, (K8, 128), 1)

    def body(j, carry):
        X, p, rec = carry
        rf_j = rf_ref[0, 0, j]
        fwd = build_fwd(spec, has_stim, "scalar", [rf_j], Y, W,
                        svals, N_pad, D_pad, dtype)
        X, p, f, gX, gp, pgn, niter, nfev, status = _solve_one(
            opts, fwd, pmask, scratch, None, X, p)
        dobs = X - Y
        me = me_norm * jnp.sum(W * dobs * dobs)
        row = ((ci == 0).astype(dtype) * f
               + (ci == 1).astype(dtype) * me
               + (ci == 2).astype(dtype) * pgn
               + (ci == 3).astype(dtype) * niter.astype(dtype)
               + (ci == 4).astype(dtype) * nfev.astype(dtype)
               + (ci == 5).astype(dtype) * status.astype(dtype))
        rec = rec + (ri == j).astype(dtype) * row
        return X, p, rec

    # i32 loop bounds: under x64 python-int bounds make the fori index
    # weak-i64, and Mosaic's i64->i32 _convert_helper recurses forever
    # (CLAUDE.md lowering pitfalls — bench enables x64 for the f64 tail
    # BEFORE tracing this kernel)
    X, p, rec = lax.fori_loop(
        jnp.int32(0), jnp.int32(k), body,
        (X0, p_ref[0], jnp.zeros((K8, 128), dtype)))
    Xo_ref[0] = X
    po_ref[0] = p
    rec_ref[0] = rec


def _ladder_batched(spec, has_stim, opts, k, X, p2, pm, rfs, yv, wv,
                    sts):
    """X (B, N_pad, D_pad); rfs (B, 1, k) per-rung rf values."""
    B, N_pad, D_pad = X.shape
    NP_pad = p2.shape[-1]
    m = opts.m
    K8 = _pad_to(k, 8)
    kern = functools.partial(_ladder_kernel, spec, has_stim, opts, k)
    vmem = pltpu.VMEM

    def per_member(shp):
        return pl.BlockSpec(shp,
                            lambda b: (b,) + (b * 0,) * (len(shp) - 1),
                            memory_space=vmem)

    shared3 = pl.BlockSpec((1, N_pad, D_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    in_specs = [per_member((1, N_pad, D_pad)),
                per_member((1, 1, NP_pad)),
                per_member((1, 1, NP_pad)),
                pl.BlockSpec((1, 1, k), lambda b: (b, b * 0, b * 0),
                             memory_space=pltpu.SMEM),
                shared3, shared3]
    args = [X, p2, pm, rfs, yv, wv]
    if has_stim:
        S_pad = sts[0].shape[-1]
        sshared = pl.BlockSpec((1, N_pad, S_pad),
                               lambda b: (b * 0, b * 0, b * 0),
                               memory_space=vmem)
        in_specs += [sshared] * len(sts)
        args += list(sts)
    out_specs = [
        per_member((1, N_pad, D_pad)),
        per_member((1, 1, NP_pad)),
        per_member((1, K8, 128)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
        jax.ShapeDtypeStruct((B, K8, 128), X.dtype),
    ]
    scratch = [
        pltpu.VMEM((m, N_pad, D_pad), X.dtype),
        pltpu.VMEM((m, N_pad, D_pad), X.dtype),
        pltpu.VMEM((m, 1, NP_pad), X.dtype),
        pltpu.VMEM((m, 1, NP_pad), X.dtype),
    ]
    kw = {}
    if not _INTERPRET[0] and _VMEM_LIMIT > 0:
        kw["compiler_params"] = _compiler_params()
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=_INTERPRET[0], **kw)(*args)


def make_ladder_solver(spec: ProblemSpec, opts: LBFGSOptions,
                       n_rungs: int):
    """Build ``ladder(XP, rfs) -> (XP_out, records)`` running
    ``n_rungs`` warm-started scalar-rf UNBOUNDED solves in ONE Pallas
    launch per member (vmap-able via custom_vmap). ``rfs``: (n_rungs,)
    per-rung rf values (the caller computes rf0 * alpha**beta).
    ``records``: dict of (n_rungs,) arrays A/ME/FE/pgnorm/niter/nfev/
    status (A = the in-kernel action at the rung's rf; FE = A - ME).
    Only valid where :func:`ladder_supported`."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    N_pad, D_pad, NP_pad, yv, wv, sts = embed_consts(spec)
    has_stim = spec.stim_f is not None
    n_st = len(sts)
    _prep = make_prep(spec, N_pad, D_pad, NP_pad)
    pmask_np = np.zeros((1, NP_pad), np.float32)
    if spec.NPest:
        pmask_np[0, np.asarray(spec.pidx, np.int64)] = 1.0
    pmask = jnp.asarray(pmask_np)
    pcols = (np.asarray(spec.pidx, dtype=np.int32)
             if spec.NPest else None)
    k = int(n_rungs)

    @jax.custom_batching.custom_vmap
    def ladder_fn(Xp, p2, pm, rfs, *consts):
        cy, cw = consts[0], consts[1]
        outs = _ladder_batched(spec, has_stim, opts, k,
                               Xp[None], p2[None], pm[None],
                               rfs[None], cy, cw, consts[2:])
        return tuple(o[0] for o in outs)

    @ladder_fn.def_vmap
    def _ladder_vmap(axis_size, in_batched, Xp, p2, pm, rfs, *consts):
        B = axis_size

        def bc(v, isb):
            return v if isb else jnp.broadcast_to(v[None],
                                                  (B,) + v.shape)

        consts = [c[0] if isb else c
                  for c, isb in zip(consts, in_batched[4:])]
        outs = _ladder_batched(
            spec, has_stim, opts, k, bc(Xp, in_batched[0]),
            bc(p2, in_batched[1]), bc(pm, in_batched[2]),
            bc(rfs, in_batched[3]), consts[0], consts[1], consts[2:])
        return outs, (True, True, True)

    def ladder(XP, rfs):
        rfs = jnp.asarray(rfs, XP.dtype).reshape(1, k)
        Xp, p2, _, mode = _prep(XP, jnp.asarray(0.0, XP.dtype))
        if mode != "scalar":
            raise ValueError("fused ladder kernel is scalar-rf only")
        Xo, po, rec = ladder_fn(Xp, p2, pmask, rfs, yv, wv, *sts)
        x_flat = Xo[:N_f, :D].reshape(-1)
        if spec.NPest:
            x_flat = jnp.concatenate([x_flat, po[0, pcols]])
        rec = rec[:k]
        recs = dict(A=rec[:, 0], ME=rec[:, 1],
                    FE=rec[:, 0] - rec[:, 1], pgnorm=rec[:, 2],
                    niter=rec[:, 3].astype(jnp.int32),
                    nfev=rec[:, 4].astype(jnp.int32),
                    status=rec[:, 5].astype(jnp.int32))
        return x_flat, recs

    return ladder
