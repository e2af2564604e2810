"""Packed-member whole-solve kernel: k members per grid program.

Round-4 perf item (VERDICT r3 #7). The roofline study (PARITY.md) puts
the small-D fused solve ~1600x off VPU peak: each action+grad eval is a
DEPENDENT chain of small Mosaic ops whose per-op latency — not FLOPs,
not bandwidth — is the wall, and grid programs execute sequentially, so
at D=20 a 256-member rung is 256 dependent chains laid end to end.
This kernel packs ``k`` members into ONE grid program with a SHARED
solve loop: per iteration, the k members' evals sit adjacent in the
instruction stream as k INDEPENDENT chains, so the compiler can overlap
their latencies (ILP), buying up to ~k-fold issue-slot utilization
where the k=1 kernel pays full serial latency per member.

Semantics: identical per-member iterate sequences to the k=1 kernel
(``solve_pallas``) — members in a pack run in LOCKSTEP with converged /
finished-line-search members masked to frozen no-ops, exactly vmap's
masking semantics, so each member's state evolution (and its
niter/nfev/status records) is unchanged; only wall-clock allocation
differs (a pack pays its slowest member, like the vmapped XLA loop but
over packs of k instead of the whole batch). Parity is pinned in
interpret mode member-for-member against the k=1 kernel.

Unbounded f32 solves only (the bench/large-ensemble regime; bounded
campaigns stay on the k=1 bounded kernel). The public factory exposes
the same ``custom_vmap`` interface as ``solve_pallas.make_rung_solver``
— unbatched calls run a single member (k=1 path), vmapped calls pad the
batch to a multiple of ``pack`` by replicating the last member (padding
members' outputs are dropped).

Reference semantics: the reference's per-rung SciPy L-BFGS-B call
[M, SURVEY.md §2], TPU-native extreme, batched-throughput form.
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
from varanneal_tpu.kernels.solve_pallas import _cubic_min
from varanneal_tpu.opt.lbfgs import (
    LBFGSOptions, LBFGSResult, CONV_GRAD, CONV_FTOL, MAXITER, LS_FAIL)

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


_probe_cache = {}
_transient_counts = {}


def _compile_pack(spec, rf, opts, pack, bounded):
    """Compile (not run) the packed kernel at this shape under vmap.
    Split out so tests can monkeypatch a simulated OOM."""
    n = spec.n_state + spec.NPest
    lo = hi = None
    if bounded:
        lo = np.full(n, -1e6, np.float32)
        hi = np.full(n, 1e6, np.float32)
    solver = make_packed_rung_solver(spec, opts, pack,
                                     lower=lo, upper=hi)
    XP = jnp.zeros((pack, n), jnp.float32)
    rf_c = jnp.asarray(np.asarray(rf, np.float32))
    jax.jit(jax.vmap(lambda z: solver(z, rf_c))).lower(XP).compile()


def _probe_ok(spec, rf, opts, pack, bounded) -> bool:
    # shared probe driver (solve_pallas): permanent compile failures
    # cache False by TYPE/CODE classification; transient worker faults
    # retry up to the shared limit (VERDICT r4 weak #4 hardening)
    from varanneal_tpu.kernels.solve_pallas import _probe
    key = (spec.N_f, spec.D, spec.NP, spec.NPest, spec.disc,
           np.ndim(rf), opts.m, int(pack), bool(bounded),
           spec.stim_f is not None)
    return _probe(_probe_cache, _transient_counts, key,
                  lambda: _compile_pack(spec, rf, opts, pack, bounded))


def pack_supported(spec: ProblemSpec, rf, opts: LBFGSOptions, pack: int,
                   dtype=np.float32, bounded=False) -> bool:
    """Static predicate. VMEM model: the k=1 kernel's calibrated
    (m + 45|64)-block footprint is ~per-member state (vag residuals,
    line-search carries, history) except the shared consts, so a
    k-pack costs ~k * (m + 45|64) blocks (+2 shared bound blocks when
    bounded; bounded fixed footprint measured round-4, see
    solve_pallas.solve_supported). Round-5: the (N_pad, N_pad) shift
    matrix is gone (slice shifts, ag_pallas._shift_up)."""
    if pack < 1 or opts.m > 8:
        return False
    if not ag_supported(spec, rf, dtype):
        return False
    N_pad = _pad_to(spec.N_f, 8)
    D_pad = _pad_to(spec.D, 128)
    fixed = 64 if bounded else 45
    vmem = ((pack * (opts.m + fixed) + (2 if bounded else 0))
            * N_pad * D_pad) * 4
    from varanneal_tpu.kernels.solve_pallas import (_VMEM_LIMIT,
                                                    _PROBE_BYTES)
    if vmem > int(0.8 * (_VMEM_LIMIT or 16 * 2 ** 20)):
        return False
    if _INTERPRET[0]:
        return True
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:  # pragma: no cover
        return False
    if vmem > _PROBE_BYTES:
        # same two-layer policy as solve_supported: measured scoped
        # usage is scheduler-dominated — confirm with a cached real
        # compile instead of crashing a bench/campaign mid-run
        return _probe_ok(spec, rf, opts, pack, bounded)
    return True


def _pack_kernel(spec, has_stim, rf_mode, opts, k, bounded, *refs):
    """One grid program: the full L-BFGS solve of k members in a shared
    lockstep loop. Ref order:
      X_ref (k, N_pad, D_pad), p_ref (k, 1, NP_pad),
      pm_ref (1, 1, NP_pad) shared estimated-parameter mask,
      [bounded only: loX/hiX (1, N_pad, D_pad), loP/hiP (1, 1, NP_pad)
       shared, +-inf on padded/frozen entries],
      rf refs per mode (scalar SMEM (k, 1, 1) | diag blocks),
      y_ref, w_ref (1, N_pad, D_pad) shared, stimulus refs,
      -> Xo, po, gxo (k, N_pad, D_pad), gpo (k, 1, NP_pad),
         s_ref (k, 1, 128) rows [f, pgnorm, niter, nfev, status],
      scratch: per member j: Sx_j, Yx_j (m, N_pad, D_pad),
               Sp_j, Yp_j (m, 1, NP_pad)   (4k handles).
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
    scr = refs[5:]
    Sx = [scr[4 * j + 0] for j in range(k)]
    Yx = [scr[4 * j + 1] for j in range(k)]
    Sp = [scr[4 * j + 2] for j in range(k)]
    Yp = [scr[4 * j + 3] for j in range(k)]

    dtype = X_ref.dtype
    N_pad, D_pad = X_ref.shape[1], X_ref.shape[2]
    S_w = spec.stim_f.shape[1] if has_stim else 0
    svals = [r[0][:, :S_w] for r in st_refs]
    yv, wv = y_ref[0], w_ref[0]
    pmask = pm_ref[0]

    one = jnp.ones((), dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    tiny_den = jnp.asarray(1e-30, dtype)
    c1 = jnp.asarray(opts.c1, dtype)
    c2 = jnp.asarray(opts.c2, dtype)
    pgtol = jnp.asarray(opts.pgtol, dtype)
    ftol = jnp.asarray(opts.ftol, dtype)
    m_i = jnp.asarray(m, jnp.int32)

    # per-member rf values / fwd closures (shared consts, per-member rf
    # only in scalar mode — diag rf blocks are shared across the pack
    # when rf_shared, else per-member rows of a (k, ...) block)
    fwds = []
    for j in range(k):
        if rf_mode == "scalar":
            rf_vals = [rf_refs[0][j, 0, 0]]
        else:
            rf_vals = [(r[0] if r.shape[0] == 1 else r[j])
                       for r in rf_refs]
        fwds.append(build_fwd(spec, has_stim, rf_mode, rf_vals, yv, wv,
                              svals, N_pad, D_pad, dtype))

    def vag(j, Xv, pv):
        val, vjp = jax.vjp(fwds[j], Xv, pv)
        gX, gp = vjp(one)
        return val, gX, gp * pmask

    def tdot(ax, ap, bx, bp):
        return jnp.sum(ax * bx) + jnp.sum(ap * bp)

    def tmax_abs(ax, ap):
        return jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(ap)))

    if bounded:
        loX, hiX = loX_ref[0], hiX_ref[0]
        loP, hiP = loP_ref[0], hiP_ref[0]

        def proj(Xv, pv):
            return jnp.clip(Xv, loX, hiX), jnp.clip(pv, loP, hiP)

        def pg_max(Xv, pv, gXv, gpv):
            return tmax_abs(Xv - jnp.clip(Xv - gXv, loX, hiX),
                            pv - jnp.clip(pv - gpv, loP, hiP))

        def free_masks(Xv, pv, gXv, gpv):
            eps_b = jnp.asarray(1e-12, dtype)
            aX = (((Xv <= loX + eps_b) & (gXv > 0))
                  | ((Xv >= hiX - eps_b) & (gXv < 0)))
            ap_ = (((pv <= loP + eps_b) & (gpv > 0))
                   | ((pv >= hiP - eps_b) & (gpv < 0)))
            return 1.0 - aX.astype(dtype), 1.0 - ap_.astype(dtype)

    # ---- per-member two-loop direction over member j's scratch ---------
    def direction(j, gX, gp, head, hlen, fX=None, fp=None):
        qX, qp = gX, gp
        ks = []
        for t in range(m):
            idx = jnp.mod(head - 1 - t, m_i)
            valid = (t < hlen).astype(dtype)
            sXv, spv = Sx[j][idx], Sp[j][idx]
            yXv, ypv = Yx[j][idx], Yp[j][idx]
            sy = tdot(sXv, spv, yXv, ypv)
            rho = valid / jnp.maximum(sy, tiny_den)
            a_t = rho * tdot(sXv, spv, qX, qp)
            qX = qX - a_t * yXv
            qp = qp - a_t * ypv
            ks.append((a_t, rho, idx))
        idx_n = jnp.mod(head - 1, m_i)
        sXn, spn = Sx[j][idx_n], Sp[j][idx_n]
        yXn, ypn = Yx[j][idx_n], Yp[j][idx_n]
        sy_n = tdot(sXn, spn, yXn, ypn)
        yy_n = tdot(yXn, ypn, yXn, ypn)
        gamma = jnp.where(hlen > 0, sy_n / jnp.maximum(yy_n, tiny_den),
                          one)
        qX = gamma * qX
        qp = gamma * qp
        for a_t, rho, idx in reversed(ks):
            sXv, spv = Sx[j][idx], Sp[j][idx]
            yXv, ypv = Yx[j][idx], Yp[j][idx]
            beta = rho * tdot(yXv, ypv, qX, qp)
            qX = qX + (a_t - beta) * sXv
            qp = qp + (a_t - beta) * spv
        dX, dp = -qX, -qp
        if fX is not None:     # bound-active components frozen out
            dX = dX * fX
            dp = dp * fp
        desc = tdot(dX, dp, gX, gp)
        bad = (desc >= 0) | ~jnp.isfinite(desc)
        return (jnp.where(bad, -gX, dX), jnp.where(bad, -gp, dp))

    # ---- shared strong-Wolfe line search over the pack -----------------
    # Per-member state tuple mirrors solve_pallas's 18-field carry; the
    # k members step in lockstep inside ONE while_loop, each masked by
    # its own done/failed. One vag per member per loop iteration — the
    # k independent eval chains adjacent in the instruction stream are
    # the whole point of the pack.
    def ls_init(j, f0, dphi0, a_init):
        zero = jnp.zeros((), dtype)
        return (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                jnp.minimum(a_init, big), zero, f0, dphi0,
                zero, f0, dphi0, zero, f0, dphi0, zero, f0)

    def ls_step(j, s, xX, xp, dX, dp, f0, dphi0, gX_st, gp_st):
        (stage, done, failed, i, a, a_prev, f_prev, d_prev,
         a_lo, f_lo, d_lo, a_hi, f_hi, d_hi, a_star, f_star) = s
        f_a, gX_a, gp_a = vag(j, xX + a * dX, xp + a * dp)
        dphi_a = tdot(gX_a, gp_a, dX, dp)
        i_n = i + 1
        armijo_fail = (f_a > f0 + c1 * a * dphi0)
        nan_bad = ~jnp.isfinite(f_a)
        curv_ok = jnp.abs(dphi_a) <= -c2 * dphi0
        in_br = stage == 0

        at_cap = a >= big
        hi_b = armijo_fail | ((i_n > 1) & (f_a >= f_prev)) | nan_bad
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
        failed_n = jnp.where(in_br, nan_bad & (i_n >= opts.maxls),
                             tiny & ~accept)
        stage_n = jnp.where(in_br & ~enter_zoom, jnp.int32(0),
                            jnp.int32(1))
        s_new = (stage_n, accept, failed_n, i_n, a_next,
                 a, jnp.where(in_br, f_a, f_prev),
                 jnp.where(in_br, dphi_a, d_prev),
                 a_lo_n, f_lo_n, d_lo_n, a_hi_n, f_hi_n, d_hi_n,
                 jnp.where(accept, a, a_star),
                 jnp.where(accept, f_a, f_star))
        gX_st_n = jnp.where(accept, gX_a, gX_st)
        gp_st_n = jnp.where(accept, gp_a, gp_st)
        return s_new, gX_st_n, gp_st_n

    def shared_line_search(xs, ps, ds_X, ds_p, fs, gXs, gps, a_inits,
                           runs):
        """k line searches in one while loop; ``runs[j]`` False members
        (outer-converged — vmap masking) never evaluate. Returns
        per-member (a, f, gX, gp, nfev, ok)."""
        dphi0s = [tdot(gXs[j], gps[j], ds_X[j], ds_p[j])
                  for j in range(k)]
        states = [ls_init(j, fs[j], dphi0s[j], a_inits[j])
                  for j in range(k)]
        gX_sts = list(gXs)
        gp_sts = list(gps)

        def active(j, s):
            return runs[j] & ~(s[1] | s[2]) & (s[3] < opts.maxls)

        def cond(carry):
            sts = carry[0]
            acc = active(0, sts[0])
            for j in range(1, k):
                acc = acc | active(j, sts[j])
            return acc

        def body(carry):
            sts, gXl, gpl = carry
            sts_n, gXn, gpn = [], [], []
            for j in range(k):
                run = active(j, sts[j])
                s_new, gX_n, gp_n = ls_step(
                    j, sts[j], xs[j], ps[j], ds_X[j], ds_p[j], fs[j],
                    dphi0s[j], gXl[j], gpl[j])
                # freeze finished members (vmap masking semantics)
                s_keep = tuple(jnp.where(run, a, b)
                               for a, b in zip(s_new, sts[j]))
                sts_n.append(s_keep)
                gXn.append(jnp.where(run, gX_n, gXl[j]))
                gpn.append(jnp.where(run, gp_n, gpl[j]))
            return (tuple(sts_n), tuple(gXn), tuple(gpn))

        sts, gX_sts, gp_sts = lax.while_loop(
            cond, body, (tuple(states), tuple(gX_sts), tuple(gp_sts)))

        outs = []
        for j in range(k):
            (stage, done, failed, i, a, a_prev, f_prev, d_prev,
             a_lo, f_lo, d_lo, a_hi, f_hi, d_hi, a_star, f_star) = sts[j]
            have_lo = (a_lo > 0) & (f_lo < fs[j])
            ok = done | have_lo
            need_lo = ~done & have_lo
            f_lo_e, gX_lo_e, gp_lo_e = lax.cond(
                need_lo,
                lambda j=j, a_lo=a_lo: vag(
                    j, xs[j] + a_lo * ds_X[j], ps[j] + a_lo * ds_p[j]),
                lambda j=j: (fs[j], gXs[j], gps[j]))
            a_out = jnp.where(done, a_star,
                              jnp.where(have_lo, a_lo,
                                        jnp.zeros((), dtype)))
            f_out = jnp.where(done, f_star,
                              jnp.where(have_lo, f_lo_e, fs[j]))
            gX_out = jnp.where(done, gX_sts[j],
                               jnp.where(have_lo, gX_lo_e, gXs[j]))
            gp_out = jnp.where(done, gp_sts[j],
                               jnp.where(have_lo, gp_lo_e, gps[j]))
            nfev = i + jnp.where(done | ~have_lo, jnp.int32(0),
                                 jnp.int32(1))
            outs.append((a_out, f_out, gX_out, gp_out, nfev, ok))
        return outs

    # ---- shared projected-path Armijo backtracking (bounded only) ------
    # Mirrors solve_pallas's proj_ls, k members in one while loop; the
    # accept test rides the cond (recomputed from the carry) so the body
    # is one unconditional vag per active member.
    def shared_proj_ls(xs, ps, ds_X, ds_p, fs, gXs, gps, a_inits,
                       runs):
        def trial(j, a):
            return proj(xs[j] + a * ds_X[j], ps[j] + a * ds_p[j])

        def armijo_ok(j, X_a, p_a, f_a):
            gdx = tdot(gXs[j], gps[j], X_a - xs[j], p_a - ps[j])
            return ((f_a <= fs[j] + c1 * gdx) & jnp.isfinite(f_a)
                    & (f_a < fs[j]))

        states = []
        for j in range(k):
            a0 = jnp.asarray(a_inits[j], dtype)
            X_t, p_t = trial(j, a0)
            f_t, gX_t, gp_t = vag(j, X_t, p_t)
            states.append((jnp.ones((), jnp.int32), a0, X_t, p_t, f_t,
                           gX_t, gp_t))

        def active(j, s):
            # outer-converged members (runs[j] False) never loop
            return (runs[j] & ~armijo_ok(j, s[2], s[3], s[4])
                    & (s[0] < opts.maxls))

        def cond(carry):
            acc = active(0, carry[0])
            for j in range(1, k):
                acc = acc | active(j, carry[j])
            return acc

        def body(carry):
            out = []
            for j in range(k):
                i, a = carry[j][0], carry[j][1]
                run = active(j, carry[j])
                a_n = 0.5 * a
                X_n, p_n = trial(j, a_n)
                f_n, gX_n, gp_n = vag(j, X_n, p_n)
                new = (i + 1, a_n, X_n, p_n, f_n, gX_n, gp_n)
                out.append(tuple(jnp.where(run, a_, b_)
                                 for a_, b_ in zip(new, carry[j])))
            return tuple(out)

        final = lax.while_loop(cond, body, tuple(states))
        outs = []
        for j in range(k):
            i, a, X_a, p_a, f_a, gX_a, gp_a = final[j]
            ok = armijo_ok(j, X_a, p_a, f_a)
            X_new = jnp.where(ok, X_a, xs[j])
            p_new = jnp.where(ok, p_a, ps[j])
            f_new = jnp.where(ok, f_a, fs[j])
            gX_new = jnp.where(ok, gX_a, gXs[j])
            gp_new = jnp.where(ok, gp_a, gps[j])
            outs.append((X_new, p_new, f_new, gX_new, gp_new, i, ok))
        return outs

    # ---- init -----------------------------------------------------------
    X0s = [X_ref[j] for j in range(k)]
    p0s = [p_ref[j] for j in range(k)]
    if bounded:
        prj = [proj(X0s[j], p0s[j]) for j in range(k)]
        X0s = [t[0] for t in prj]
        p0s = [t[1] for t in prj]
    inits = []
    for j in range(k):
        f0, gX0, gp0 = vag(j, X0s[j], p0s[j])
        if bounded:
            pg0 = pg_max(X0s[j], p0s[j], gX0, gp0)
            fX0, fp0 = free_masks(X0s[j], p0s[j], gX0, gp0)
            d0X, d0p = -gX0 * fX0, -gp0 * fp0
        else:
            pg0 = tmax_abs(gX0, gp0)
            d0X, d0p = -gX0, -gp0
        gn1_0 = jnp.sum(jnp.abs(gX0)) + jnp.sum(jnp.abs(gp0))
        done0 = pg0 <= pgtol
        status0 = jnp.where(done0, jnp.int32(CONV_GRAD),
                            jnp.int32(MAXITER))
        inits.append((X0s[j], p0s[j], f0, gX0, gp0, d0X, d0p, gn1_0,
                      jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32),
                      status0, done0))
        for t in range(m):
            ti = jnp.asarray(t, jnp.int32)
            Sx[j][ti] = jnp.zeros((N_pad, D_pad), dtype)
            Yx[j][ti] = jnp.zeros((N_pad, D_pad), dtype)
            Sp[j][ti] = jnp.zeros((1, Sp[j].shape[-1]), dtype)
            Yp[j][ti] = jnp.zeros((1, Yp[j].shape[-1]), dtype)

    def running(s):
        return ~s[13] & (s[10] < opts.maxiter)

    def cond(carry):
        acc = running(carry[0])
        for j in range(1, k):
            acc = acc | running(carry[j])
        return acc

    def body(carry):
        xs = [carry[j][0] for j in range(k)]
        ps = [carry[j][1] for j in range(k)]
        fs = [carry[j][2] for j in range(k)]
        gXs = [carry[j][3] for j in range(k)]
        gps = [carry[j][4] for j in range(k)]
        dXs = [carry[j][5] for j in range(k)]
        dps = [carry[j][6] for j in range(k)]
        gn1s = [carry[j][7] for j in range(k)]
        heads = [carry[j][8] for j in range(k)]
        hlens = [carry[j][9] for j in range(k)]
        a_inits = [jnp.where(
            hlens[j] == 0,
            jnp.minimum(one, 1.0 / jnp.maximum(gn1s[j], tiny_den)), one)
            for j in range(k)]
        runs = [running(carry[j]) for j in range(k)]
        if bounded:
            ls_outs = shared_proj_ls(xs, ps, dXs, dps, fs, gXs, gps,
                                     a_inits, runs)
        else:
            ls_outs = shared_line_search(xs, ps, dXs, dps, fs, gXs,
                                         gps, a_inits, runs)
        out = []
        for j in range(k):
            (X, p, f, gX, gp, dX, dp, gn1, head, hlen, niter, nfev,
             status, done) = carry[j]
            run = running(carry[j])
            if bounded:
                (X_new, p_new, f_new, gX_new, gp_new, ls_nfev,
                 ls_ok) = ls_outs[j]
            else:
                a, f_new, gX_new, gp_new, ls_nfev, ls_ok = ls_outs[j]
                X_new = X + a * dX
                p_new = p + a * dp

            sXv = X_new - X
            spv = p_new - p
            yXv = gX_new - gX
            ypv = gp_new - gp
            sy = tdot(sXv, spv, yXv, ypv)
            s2 = tdot(sXv, spv, sXv, spv)
            y2 = tdot(yXv, ypv, yXv, ypv)
            good = (run & ls_ok & (sy > 1e-10 * jnp.sqrt(s2 * y2))
                    & (sy > 0))
            gf = good.astype(dtype)
            Sx[j][head] = gf * sXv + (1.0 - gf) * Sx[j][head]
            Yx[j][head] = gf * yXv + (1.0 - gf) * Yx[j][head]
            Sp[j][head] = gf * spv + (1.0 - gf) * Sp[j][head]
            Yp[j][head] = gf * ypv + (1.0 - gf) * Yp[j][head]
            head_n = jnp.where(good, jnp.mod(head + 1, m_i), head)
            hlen_n = jnp.where(good, jnp.minimum(hlen + 1, m), hlen)

            pgn = (pg_max(X_new, p_new, gX_new, gp_new) if bounded
                   else tmax_abs(gX_new, gp_new))
            gn1_n = (jnp.sum(jnp.abs(gX_new))
                     + jnp.sum(jnp.abs(gp_new)))
            df = f - f_new
            fden = jnp.maximum(
                jnp.maximum(jnp.abs(f), jnp.abs(f_new)), one)
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
                dX_n, dp_n = direction(j, gX_new * fXm, gp_new * fpm,
                                       head_n, hlen_n, fXm, fpm)
            else:
                dX_n, dp_n = direction(j, gX_new, gp_new, head_n,
                                       hlen_n)
            X_out = jnp.where(fail, X, X_new)
            p_out = jnp.where(fail, p, p_new)
            f_out = jnp.where(fail, f, f_new)
            gX_out = jnp.where(fail, gX, gX_new)
            gp_out = jnp.where(fail, gp, gp_new)
            new = (X_out, p_out, f_out, gX_out, gp_out, dX_n, dp_n,
                   gn1_n, head_n, hlen_n, niter + 1, nfev + ls_nfev,
                   status_n, done_n)
            # members not running this outer iteration stay frozen
            out.append(tuple(jnp.where(run, a_, b_)
                             for a_, b_ in zip(new, carry[j])))
        return tuple(out)

    final = lax.while_loop(cond, body, tuple(inits))
    cc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for j in range(k):
        (X, p, f, gX, gp, dX, dp, gn1, head, hlen, niter, nfev,
         status, done) = final[j]
        pgn = pg_max(X, p, gX, gp) if bounded else tmax_abs(gX, gp)
        Xo_ref[j] = X
        po_ref[j] = p
        gxo_ref[j] = gX
        gpo_ref[j] = gp
        s_ref[j] = ((cc == 0).astype(dtype) * f
                    + (cc == 1).astype(dtype) * pgn
                    + (cc == 2).astype(dtype) * niter.astype(dtype)
                    + (cc == 3).astype(dtype) * nfev.astype(dtype)
                    + (cc == 4).astype(dtype) * status.astype(dtype))


def _pack_batched(spec, has_stim, rf_mode, rf_shared, opts, pack,
                  X, p2, pm, rf_args, yv, wv, sts, bnds=None):
    """X (B, N_pad, D_pad) with B a multiple of ``pack``; ``bnds`` the
    shared (loX, hiX, loP, hiP) bound blocks or None."""
    B, N_pad, D_pad = X.shape
    NP_pad = p2.shape[-1]
    m = opts.m
    assert B % pack == 0
    G = B // pack
    bounded = bnds is not None
    kern = functools.partial(_pack_kernel, spec, has_stim, rf_mode,
                             opts, pack, bounded)
    vmem = pltpu.VMEM

    def per_pack(shp):
        return pl.BlockSpec(shp,
                            lambda b: (b,) + (b * 0,) * (len(shp) - 1),
                            memory_space=vmem)

    shared3 = pl.BlockSpec((1, N_pad, D_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    sharedp = pl.BlockSpec((1, 1, NP_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    in_specs = [per_pack((pack, N_pad, D_pad)),
                per_pack((pack, 1, NP_pad)),
                sharedp]
    if bounded:
        in_specs += [shared3, shared3, sharedp, sharedp]
    if rf_mode == "scalar":
        in_specs.append(pl.BlockSpec((pack, 1, 1),
                                     lambda b: (b, b * 0, b * 0),
                                     memory_space=pltpu.SMEM))
    else:
        for _ in rf_args:
            in_specs.append(shared3 if rf_shared
                            else per_pack((pack, N_pad, D_pad)))
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
        per_pack((pack, N_pad, D_pad)),
        per_pack((pack, 1, NP_pad)),
        per_pack((pack, N_pad, D_pad)),
        per_pack((pack, 1, NP_pad)),
        per_pack((pack, 1, 128)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, 128), X.dtype),
    ]
    scratch = []
    for _ in range(pack):
        scratch += [pltpu.VMEM((m, N_pad, D_pad), X.dtype),
                    pltpu.VMEM((m, N_pad, D_pad), X.dtype),
                    pltpu.VMEM((m, 1, NP_pad), X.dtype),
                    pltpu.VMEM((m, 1, NP_pad), X.dtype)]
    kw = {}
    from varanneal_tpu.kernels import solve_pallas as _sp
    if not _INTERPRET[0] and _sp._VMEM_LIMIT > 0:
        kw["compiler_params"] = _sp._compiler_params()
    return pl.pallas_call(
        kern, grid=(G,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=_INTERPRET[0], **kw)(*args)


def make_packed_rung_solver(spec: ProblemSpec, opts: LBFGSOptions,
                            pack: int, lower=None, upper=None):
    """Same ``solve(XP, rf) -> LBFGSResult`` custom_vmap interface as
    ``solve_pallas.make_rung_solver`` (drop-in for the
    ``run_ladder(rung_solver=)`` hook under vmap), but vmapped batches
    run ``pack`` members per grid program. Unbatched calls use a pack
    of 1. Batches not divisible by ``pack`` are padded by replicating
    the last member; padding outputs are dropped. ``lower``/``upper``:
    optional flat bound vectors (packed XP layout, as from
    ``api.build_bounds``) — the pack then runs the PROJECTION bounded
    algorithm in-kernel, like the k=1 bounded kernel."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    N_pad, D_pad, NP_pad, yv, wv, sts = embed_consts(spec)
    has_stim = spec.stim_f is not None
    n_st = len(sts)
    _prep = make_prep(spec, N_pad, D_pad, NP_pad)
    pmask_np = np.zeros((1, NP_pad), np.float32)
    if spec.NPest:
        pmask_np[0, np.asarray(spec.pidx, np.int64)] = 1.0
    pmask = jnp.asarray(pmask_np)[None]           # (1, 1, NP_pad)
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
            outs = _pack_batched(spec, has_stim, rf_mode, False, opts,
                                 1, Xp[None], p2[None], pm, rf_args,
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
            pmv = pm[0] if in_batched[2] else pm
            rf_shared = rf_mode != "scalar" and not any(rf_b)
            if rf_shared:
                rf_args = [r[None] for r in rf_in]
            else:
                rf_args = [bc(r, isb) for r, isb in zip(rf_in, rf_b)]
            # pad the batch to a multiple of the pack
            pad = (-B) % pack
            if pad:
                def padded(v):
                    return jnp.concatenate(
                        [v, jnp.broadcast_to(v[-1:],
                                             (pad,) + v.shape[1:])], 0)
                Xp = padded(Xp)
                p2 = padded(p2)
                if not rf_shared:
                    rf_args = [padded(r) for r in rf_args]
            outs = _pack_batched(spec, has_stim, rf_mode, rf_shared,
                                 opts, pack, Xp, p2, pmv, rf_args,
                                 cy, cw, consts[2: 2 + n_st],
                                 tuple(consts[2 + n_st:]) if bounded
                                 else None)
            if pad:
                outs = tuple(o[:B] for o in outs)
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
