"""Pallas TPU kernel: fused model-error (FE) residual assembly + quadratic
accumulation over the (N_f, D) state-time plane.

This is the hot op of the whole framework (BASELINE north star: "residual
assembly in Pallas"): every L-BFGS iteration evaluates FE and its gradient.
The kernel streams time-blocks of the state plane through VMEM, evaluates
the user vector field f INSIDE the kernel (f is jnp-traceable, so Mosaic
lowers it), forms the discretization residual, contracts with the annealed
precision, and accumulates per-block partial sums — no materialized (N, D)
residual/f arrays in HBM.

Kernel shape (the Mosaic-friendly design, learned the hard way):

- stencil halos are expressed as standard-blocked SHIFTED VIEWS — X[:-1]
  and X[1:] for the one-step discs; the strided even/mid/even triplet for
  Hermite–Simpson — instead of manual halo DMA (unaligned HBM->VMEM slices
  violate the 128-lane tiling rule, and manual DMA forfeits Mosaic's
  automatic double-buffered pipelining);
- arrays are lane-padded to the 128 tile outside; compute value-slices back
  to the real D columns;
- per-block partial sums land in a full-array SMEM output, one row per
  grid step (per-block (1,1) blocking violates the block-shape rule);
- boundary/padding masking is encoded in ZERO WEIGHT ROWS (or an iota
  valid-mask for the scalar-rf fast path) — no data-dependent branching.

Scope (v3): ALL four discretizations including SimpsonHermite, scalar or
canonical (N_f-1, D)-diagonal rf, stimulus-driven f (the reference's
``f(t, x, (p, stim))`` convention — NaKL config #3 is eligible), f with
EXPLICIT t dependence (the true model-grid time is reconstructed per row
from the grid program id — the grid is uniform by construction, see
``ops/spec.py :: build_spec`` — so non-autonomous models cost no extra
VMEM traffic), fused Pallas backward for every disc. Remaining
exclusions, falling back to the general XLA path
(``ops.action.model_error``): time-dependent parameters, full-matrix rf,
and hand-built specs with a non-uniform time grid. Use
:func:`fe_supported` to test eligibility.

Correctness is tested in interpreter mode on CPU against the oracle-pinned
XLA path (tests/test_pallas.py) and re-verified on real TPU hardware; the
kernel must win a real-TPU benchmark against the XLA path before being
preferred (bench.py with BENCH_PALLAS=1; PARITY.md perf table).
"""

import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from varanneal_tpu.ops.spec import ProblemSpec
from varanneal_tpu.ops import action as _action

# interpreter-mode toggle for CPU testing
_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


def _grid_dt(spec: ProblemSpec) -> float:
    """Model-grid row spacing: dt for one-step discs, dt/2 under
    Hermite–Simpson (the doubled grid; ops/spec.py grid conventions)."""
    return spec.dt / 2.0 if spec.disc == "SimpsonHermite" else spec.dt


def _uniform_grid(spec: ProblemSpec) -> bool:
    t_f = np.asarray(spec.t_f)
    ref = t_f[0] + _grid_dt(spec) * np.arange(t_f.shape[0])
    return bool(np.allclose(t_f, ref, rtol=1e-12, atol=1e-9))


def fe_supported(spec: ProblemSpec, rf) -> bool:
    """Is the fused Pallas FE kernel applicable to this problem?

    Explicit t dependence IS supported: the kernel reconstructs the true
    model-grid time per residual row (uniform grid, so t is affine in the
    row index — no streamed time input needed). Hand-built specs with a
    non-uniform ``t_f`` fall back to XLA."""
    rf = np.asarray(rf)
    return (spec.disc in ("euler", "trapezoid", "forwardmap",
                          "SimpsonHermite")
            and not spec.time_dep_p
            and rf.ndim in (0, 2)
            and _uniform_grid(spec))


def _t_rows(spec, idx0, n, dtype, stride=1):
    """Times of ``n`` model-grid rows idx0, idx0+stride, ... for (possibly
    traced) row index ``idx0``, shape (n,). 2-D iota then a column slice —
    Mosaic requires >=2-D iota on TPU."""
    j = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    gdt = jnp.asarray(_grid_dt(spec), dtype)
    t0 = jnp.asarray(float(np.asarray(spec.t_f)[0]), dtype)
    return t0 + gdt * (idx0 + stride * j).astype(dtype)


def _call_f(spec, t, x, p, s):
    if s is None:
        return spec.f(t, x, p)
    return spec.f(t, x, (p, s))


def _block_residual(spec: ProblemSpec, t_n, x_n, x_np1, p,
                    s_n=None, s_np1=None):
    """One-step discretization residual rows from the two shifted blocks.
    ``t_n``: (n,) times of the x_n rows; x_np1 rows sit at t_n + h."""
    h = spec.dt
    fn = _call_f(spec, t_n, x_n, p, s_n)
    if spec.disc == "trapezoid":
        fnp1 = _call_f(spec, t_n + h, x_np1, p, s_np1)
        return x_np1 - x_n - (h / 2.0) * (fn + fnp1)
    if spec.disc == "euler":
        return x_np1 - x_n - h * fn
    return x_np1 - fn          # forwardmap


def _sh_residuals(spec, te0, xe0, xm, xe1, p, se0=None, sm=None, se1=None):
    """Hermite–Simpson residual pair on one block of intervals
    [pinned-by-oracle, ops/disc.py formulas]. ``te0``: (n,) times of the
    even start nodes; midpoints sit at te0 + h/2, end nodes at te0 + h."""
    h = spec.dt
    f0 = _call_f(spec, te0, xe0, p, se0)
    fm = _call_f(spec, te0 + h / 2.0, xm, p, sm)
    f1 = _call_f(spec, te0 + h, xe1, p, se1)
    simpson = xe1 - xe0 - (h / 6.0) * (f0 + 4.0 * fm + f1)
    hermite = xm - 0.5 * (xe0 + xe1) - (h / 8.0) * (f0 - f1)
    return simpson, hermite, (f0, fm, f1)


# ---------------------------------------------------------------------------
# one-step discretizations (euler / trapezoid / forwardmap)
# ---------------------------------------------------------------------------

def _kern_scalar(spec, block_n, has_stim, *refs):
    if has_stim:
        x0_ref, x1_ref, s0_ref, s1_ref, p_ref, rf_ref, out_ref = refs
        s0, s1 = s0_ref[...], s1_ref[...]
    else:
        x0_ref, x1_ref, p_ref, rf_ref, out_ref = refs
        s0 = s1 = None
    i = pl.program_id(0)
    x0 = x0_ref[:, : spec.D]
    t_n = _t_rows(spec, i * block_n, x0.shape[0], x0.dtype)
    r = _block_residual(spec, t_n, x0, x1_ref[:, : spec.D],
                        p_ref[0], s0, s1)
    row0 = i * block_n
    valid = (row0 + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
             < spec.N_f - 1).astype(r.dtype)
    out_ref[i, 0] = rf_ref[0, 0] * jnp.sum(valid * r * r)


def _kern_diag(spec, block_n, has_stim, *refs):
    if has_stim:
        x0_ref, x1_ref, s0_ref, s1_ref, p_ref, rf_ref, out_ref = refs
        s0, s1 = s0_ref[...], s1_ref[...]
    else:
        x0_ref, x1_ref, p_ref, rf_ref, out_ref = refs
        s0 = s1 = None
    i = pl.program_id(0)
    x0 = x0_ref[:, : spec.D]
    t_n = _t_rows(spec, i * block_n, x0.shape[0], x0.dtype)
    r = _block_residual(spec, t_n, x0, x1_ref[:, : spec.D],
                        p_ref[0], s0, s1)
    row0 = i * block_n
    valid = (row0 + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
             < spec.N_f - 1).astype(r.dtype)
    out_ref[i, 0] = jnp.sum(rf_ref[:, : spec.D] * valid * r * r)


def _disc_coeffs(spec: ProblemSpec):
    """Unified adjoint coefficients: gx_m = 2c [wr_{m-1} - a1 wr_m
    - J_m^T v_m], gp = -2c sum_m F_m^T v_m, with v_m = c0 wr_{m-1}
    + c1 wr_m (hand-derived; cross-checked against the analytic C++
    engine's formulas in native/valib.cpp and jax.grad)."""
    h = spec.dt
    if spec.disc == "trapezoid":
        return 1.0, h / 2.0, h / 2.0
    if spec.disc == "euler":
        return 1.0, 0.0, h
    return 0.0, 0.0, 1.0   # forwardmap


def _kern_bwd(spec, block_n, NP, has_stim, *refs):
    """Backward block: gradient rows m in [i*B, (i+1)*B).

    Inputs are shifted views so row j of the block sees x_{m-1}, x_m,
    x_{m+1} and the weight rows w_{m-1}, w_m (zero rows encode the
    boundary / padding, so no explicit masks are needed)."""
    if has_stim:
        (xprev_ref, xmid_ref, xnext_ref, sprev_ref, smid_ref, snext_ref,
         wprev_ref, wcur_ref, p_ref, gx_ref, gp_ref) = refs
        s_prev, s_mid, s_next = sprev_ref[...], smid_ref[...], snext_ref[...]
    else:
        (xprev_ref, xmid_ref, xnext_ref, wprev_ref, wcur_ref, p_ref,
         gx_ref, gp_ref) = refs
        s_prev = s_mid = s_next = None
    i = pl.program_id(0)
    D = spec.D
    a1, c0, c1 = _disc_coeffs(spec)
    x_prev = xprev_ref[:, :D]
    x_mid = xmid_ref[:, :D]
    x_next = xnext_ref[:, :D]
    w_prev = wprev_ref[:, :D]
    w_cur = wcur_ref[:, :D]
    p = p_ref[0]

    # row j of the block is gradient row m = i*block_n + j (time t_m); the
    # duplicated-front-row residual at m=0 carries a zero weight row, so
    # its (out-of-grid) time t_{-1} never contributes
    t_mid = _t_rows(spec, i * block_n, x_mid.shape[0], x_mid.dtype)
    gdt = _grid_dt(spec)
    wr_prev = w_prev * _block_residual(spec, t_mid - gdt, x_prev, x_mid, p,
                                       s_prev, s_mid)
    wr_cur = w_cur * _block_residual(spec, t_mid, x_mid, x_next, p,
                                     s_mid, s_next)
    v = c0 * wr_prev + c1 * wr_cur

    _, f_vjp = jax.vjp(lambda xx, pp: _call_f(spec, t_mid, xx, pp, s_mid),
                       x_mid, p)
    xbar, pbar = f_vjp(v)

    gx = wr_prev - a1 * wr_cur - xbar
    gx_ref[:, :D] = gx
    if D < gx_ref.shape[-1]:           # static; zero-width writes are
        gx_ref[:, D:] = jnp.zeros_like(gx_ref[:, D:])  # rejected by Mosaic
    for j in range(NP):
        gp_ref[i, j] = -pbar[j]


# ---------------------------------------------------------------------------
# Hermite–Simpson (interval-blocked: even/mid/even views)
# ---------------------------------------------------------------------------

def _kern_sh_fwd(spec, has_stim, *refs):
    """Forward SH block: partial sum of ws⊙S² + wh⊙H² over the block's
    intervals. Zero weight rows encode padding — no valid mask needed."""
    if has_stim:
        (xe0_ref, xm_ref, xe1_ref, se0_ref, sm_ref, se1_ref,
         ws_ref, wh_ref, p_ref, out_ref) = refs
        se0, sm, se1 = se0_ref[...], sm_ref[...], se1_ref[...]
    else:
        (xe0_ref, xm_ref, xe1_ref, ws_ref, wh_ref, p_ref, out_ref) = refs
        se0 = sm = se1 = None
    i = pl.program_id(0)
    D = spec.D
    xe0 = xe0_ref[:, :D]
    # interval k starts at even grid row 2k: te0 = t0 + k*dt
    block_k = xe0.shape[0]
    te0 = _t_rows(spec, 2 * i * block_k, block_k, xe0.dtype, stride=2)
    S, H, _ = _sh_residuals(spec, te0, xe0, xm_ref[:, :D],
                            xe1_ref[:, :D], p_ref[0], se0, sm, se1)
    out_ref[i, 0] = (jnp.sum(ws_ref[:, :D] * S * S)
                     + jnp.sum(wh_ref[:, :D] * H * H))


def _kern_sh_bwd(spec, NP, has_stim, *refs):
    """Backward SH block: per-interval gradient triplet (g_e0, g_m, g_e1)
    and the parameter-gradient partial row. The caller recombines the
    overlapping even-node contributions (g_even[j] = g_e1[j-1] + g_e0[j])
    with one shift-add outside the kernel — no in-kernel scatter.

    Adjoint (hand-derived from ops/disc.py; WS = ws⊙S, WH = wh⊙H):
        g_e0 = −WS − WH/2 + J0ᵀ v0,   v0 = −(h/6) WS − (h/8) WH
        g_m  =  WH        + Jmᵀ vm,   vm = −(4h/6) WS
        g_e1 =  WS − WH/2 + J1ᵀ v1,   v1 = −(h/6) WS + (h/8) WH
        gp   = Σ (J0pᵀ v0 + Jmpᵀ vm + J1pᵀ v1)
    (outer factor 2/norm applied by the caller)."""
    if has_stim:
        (xe0_ref, xm_ref, xe1_ref, se0_ref, sm_ref, se1_ref,
         ws_ref, wh_ref, p_ref, ge0_ref, gm_ref, ge1_ref, gp_ref) = refs
        se0, sm, se1 = se0_ref[...], sm_ref[...], se1_ref[...]
    else:
        (xe0_ref, xm_ref, xe1_ref, ws_ref, wh_ref, p_ref,
         ge0_ref, gm_ref, ge1_ref, gp_ref) = refs
        se0 = sm = se1 = None
    i = pl.program_id(0)
    D = spec.D
    h = spec.dt
    p = p_ref[0]
    xe0, xm, xe1 = xe0_ref[:, :D], xm_ref[:, :D], xe1_ref[:, :D]
    block_k = xe0.shape[0]
    te0 = _t_rows(spec, 2 * i * block_k, block_k, xe0.dtype, stride=2)
    S, H, _ = _sh_residuals(spec, te0, xe0, xm, xe1, p, se0, sm, se1)
    WS = ws_ref[:, :D] * S
    WH = wh_ref[:, :D] * H
    v0 = -(h / 6.0) * WS - (h / 8.0) * WH
    vm = -(4.0 * h / 6.0) * WS
    v1 = -(h / 6.0) * WS + (h / 8.0) * WH

    _, vjp0 = jax.vjp(lambda xx, pp: _call_f(spec, te0, xx, pp, se0),
                      xe0, p)
    _, vjpm = jax.vjp(lambda xx, pp: _call_f(spec, te0 + h / 2.0, xx, pp,
                                             sm), xm, p)
    _, vjp1 = jax.vjp(lambda xx, pp: _call_f(spec, te0 + h, xx, pp, se1),
                      xe1, p)
    x0b, p0b = vjp0(v0)
    xmb, pmb = vjpm(vm)
    x1b, p1b = vjp1(v1)

    ge0 = -WS - 0.5 * WH + x0b
    gm = WH + xmb
    ge1 = WS - 0.5 * WH + x1b
    ge0_ref[:, :D] = ge0
    gm_ref[:, :D] = gm
    ge1_ref[:, :D] = ge1
    if D < ge0_ref.shape[-1]:          # static; see _kern_bwd
        ge0_ref[:, D:] = jnp.zeros_like(ge0_ref[:, D:])
        gm_ref[:, D:] = jnp.zeros_like(gm_ref[:, D:])
        ge1_ref[:, D:] = jnp.zeros_like(ge1_ref[:, D:])
    for j in range(NP):
        gp_ref[i, j] = p0b[j] + pmb[j] + p1b[j]


def make_fe_pallas(spec: ProblemSpec, block_n: int = 512,
                   pallas_backward: bool = True) -> Callable:
    """Build ``fe(X, pest, rf) -> scalar`` with a fused Pallas forward and a
    fused Pallas backward (custom_vjp). ``rf``: scalar or (N_f-1, D)."""
    if spec.disc == "SimpsonHermite":
        return _make_fe_pallas_sh(spec, block_n, pallas_backward)
    return _make_fe_pallas_onestep(spec, block_n, pallas_backward)


def _stim_views(spec, rows_pad, S_pad, dtype, front_dup=False):
    """Stimulus padded/lane-tiled to match the shifted state views."""
    S = np.asarray(spec.stim_f)
    extra = (rows_pad + 1) - spec.N_f
    if extra:
        S = np.concatenate([S, np.repeat(S[-1:], extra, axis=0)], axis=0)
    S = np.pad(S, ((0, 0), (0, S_pad - S.shape[1])))
    if front_dup:
        S = np.concatenate([S[:1], S], axis=0)
    return jnp.asarray(S, dtype)


def _make_fe_pallas_onestep(spec, block_n, pallas_backward):
    n_res = spec.N_f - 1
    block_n = int(min(block_n, max(8, ((n_res + 7) // 8) * 8)))
    n_blocks = -(-n_res // block_n)
    rows_pad = n_blocks * block_n          # rows of the shifted views
    D_pad = max(128, -(-spec.D // 128) * 128)
    has_stim = spec.stim_f is not None
    S_w = int(spec.stim_f.shape[1]) if has_stim else 0
    S_pad = max(128, -(-max(S_w, 1) // 128) * 128)

    def _pad(X):
        extra = (rows_pad + 1) - spec.N_f
        if extra:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[-1:], (extra, spec.D))], axis=0)
        return jnp.pad(X, ((0, 0), (0, D_pad - spec.D)))

    norm = spec.D * (spec.N_f - 1)
    xblk = pl.BlockSpec((block_n, D_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((block_n, S_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def _forward_pallas(X, pest, rf):
        dtype = X.dtype
        P = jnp.reshape(_action.merge_params(spec, pest, dtype), (1, -1))
        Xp = _pad(X)
        x0, x1 = Xp[:-1], Xp[1:]
        args, specs = [x0, x1], [xblk, xblk]
        if has_stim:
            Sf = _stim_views(spec, rows_pad, S_pad, dtype)
            args += [Sf[:-1], Sf[1:]]
            specs += [sblk, sblk]
        rf = jnp.asarray(rf, dtype)
        scalar_rf = rf.ndim == 0
        common = dict(
            grid=(n_blocks,),
            # full-array SMEM output; each grid step writes its own row
            # (per-block (1,1) blocking violates the block-shape rule)
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1), dtype),
            interpret=_INTERPRET[0],
        )
        if scalar_rf:
            kern = functools.partial(_kern_scalar, spec, block_n, has_stim)
            partials = pl.pallas_call(
                kern,
                in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM),
                                  pl.BlockSpec(memory_space=pltpu.SMEM)],
                **common,
            )(*args, P, jnp.reshape(rf, (1, 1)))
        else:
            pad = rows_pad - n_res
            rf_arr = jnp.concatenate(
                [rf.astype(dtype), jnp.zeros((pad, spec.D), dtype)], axis=0)
            rf_arr = jnp.pad(rf_arr, ((0, 0), (0, D_pad - spec.D)))
            kern = functools.partial(_kern_diag, spec, block_n, has_stim)
            partials = pl.pallas_call(
                kern,
                in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM),
                                  pl.BlockSpec((block_n, D_pad),
                                               lambda i: (i, 0),
                                               memory_space=pltpu.VMEM)],
                **common,
            )(*args, P, rf_arr)
        return jnp.sum(partials) / norm

    # ---------------- backward (fused Pallas adjoint) -------------------
    NP = spec.NP
    n_blocks_g = -(-spec.N_f // block_n)
    rows_g = n_blocks_g * block_n
    gblk = pl.BlockSpec((block_n, D_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    gsblk = pl.BlockSpec((block_n, S_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def _backward_pallas(X, pest, rf, g):
        dtype = X.dtype
        P = jnp.reshape(_action.merge_params(spec, pest, dtype), (1, -1))
        # states padded to rows_g + 1 rows, then a duplicated front row so
        # shifted views give (x_{m-1}, x_m, x_{m+1}) for every gradient row
        extra = (rows_g + 1) - spec.N_f
        Xb = X
        if extra:
            Xb = jnp.concatenate(
                [Xb, jnp.broadcast_to(Xb[-1:], (extra, spec.D))], axis=0)
        Xb = jnp.pad(Xb, ((0, 0), (0, D_pad - spec.D)))
        Xg = jnp.concatenate([Xb[:1], Xb], axis=0)      # rows_g + 2
        x_prev, x_mid, x_next = Xg[:-2], Xg[1:-1], Xg[2:]
        args = [x_prev, x_mid, x_next]
        specs = [gblk, gblk, gblk]
        if has_stim:
            Sg = _stim_views(spec, rows_g, S_pad, dtype, front_dup=True)
            args += [Sg[:-2], Sg[1:-1], Sg[2:]]
            specs += [gsblk, gsblk, gsblk]

        # weight rows: zero row m=-1 boundary + zero padding rows encode
        # all masking
        rf_b = jnp.asarray(rf, dtype)
        if rf_b.ndim == 0:
            W = jnp.broadcast_to(rf_b, (n_res, spec.D)).astype(dtype)
        else:
            W = rf_b.astype(dtype)
        W = jnp.concatenate(
            [jnp.zeros((1, spec.D), dtype), W,
             jnp.zeros((rows_g - n_res, spec.D), dtype)], axis=0)
        W = jnp.pad(W, ((0, 0), (0, D_pad - spec.D)))   # rows_g + 1
        w_prev, w_cur = W[:-1], W[1:]

        np_out = max(NP, 1)
        kern = functools.partial(_kern_bwd, spec, block_n, NP, has_stim)
        gx_pad, gp_parts = pl.pallas_call(
            kern,
            grid=(n_blocks_g,),
            in_specs=specs + [gblk, gblk,
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(gblk,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((rows_g, D_pad), dtype),
                       jax.ShapeDtypeStruct((n_blocks_g, np_out), dtype)),
            interpret=_INTERPRET[0],
        )(*args, w_prev, w_cur, P)
        scale = 2.0 * g / norm
        gx = scale * gx_pad[: spec.N_f, : spec.D]
        gp_full = scale * jnp.sum(gp_parts, axis=0)[:NP]
        gpest = (gp_full[np.asarray(spec.pidx, np.int32)]
                 if spec.NPest else jnp.zeros((0,), dtype))
        return gx, gpest

    return _wrap_custom_vjp(spec, _forward_pallas, _backward_pallas,
                            pallas_backward)


def _kern_sh_fwd_b(spec, has_stim, *refs):
    """Batched forward SH block: ensemble batch on the LEADING GRID AXIS
    (grid (B, n_blocks)); x blocks are (1, block_k, D_pad) per member,
    stimulus/weights shared across the batch. Round-2 measured loss under
    plain vmap (batch folds into the block, VMEM forces tiny blocks —
    PARITY A/B table) is what this layout removes: block_k stays at its
    winning size regardless of B."""
    if has_stim:
        (xe0_ref, xm_ref, xe1_ref, se0_ref, sm_ref, se1_ref,
         ws_ref, wh_ref, p_ref, out_ref) = refs
        se0, sm, se1 = se0_ref[...], sm_ref[...], se1_ref[...]
    else:
        (xe0_ref, xm_ref, xe1_ref, ws_ref, wh_ref, p_ref, out_ref) = refs
        se0 = sm = se1 = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    D = spec.D
    xe0 = xe0_ref[0, :, :D]
    block_k = xe0.shape[0]
    te0 = _t_rows(spec, 2 * i * block_k, block_k, xe0.dtype, stride=2)
    # P is a full-array VMEM (B, NP) block — per-row (1, NP) blocking
    # violates Mosaic's (8, 128)-divisibility rule; a dynamic sublane
    # slice selects member b's parameter row
    p = p_ref[pl.dslice(b, 1), :][0]
    S, H, _ = _sh_residuals(spec, te0, xe0, xm_ref[0, :, :D],
                            xe1_ref[0, :, :D], p, se0, sm, se1)
    out_ref[b, i] = (jnp.sum(ws_ref[:, :D] * S * S)
                     + jnp.sum(wh_ref[:, :D] * H * H))


def _kern_sh_bwd_b(spec, NP, has_stim, *refs):
    """Batched backward SH block (see _kern_sh_bwd for the adjoint)."""
    if has_stim:
        (xe0_ref, xm_ref, xe1_ref, se0_ref, sm_ref, se1_ref,
         ws_ref, wh_ref, p_ref, ge0_ref, gm_ref, ge1_ref, gp_ref) = refs
        se0, sm, se1 = se0_ref[...], sm_ref[...], se1_ref[...]
    else:
        (xe0_ref, xm_ref, xe1_ref, ws_ref, wh_ref, p_ref,
         ge0_ref, gm_ref, ge1_ref, gp_ref) = refs
        se0 = sm = se1 = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    D = spec.D
    h = spec.dt
    p = p_ref[pl.dslice(b, 1), :][0]   # see fwd_b
    xe0, xm, xe1 = xe0_ref[0, :, :D], xm_ref[0, :, :D], xe1_ref[0, :, :D]
    block_k = xe0.shape[0]
    te0 = _t_rows(spec, 2 * i * block_k, block_k, xe0.dtype, stride=2)
    S, H, _ = _sh_residuals(spec, te0, xe0, xm, xe1, p, se0, sm, se1)
    WS = ws_ref[:, :D] * S
    WH = wh_ref[:, :D] * H
    v0 = -(h / 6.0) * WS - (h / 8.0) * WH
    vm = -(4.0 * h / 6.0) * WS
    v1 = -(h / 6.0) * WS + (h / 8.0) * WH

    _, vjp0 = jax.vjp(lambda xx, pp: _call_f(spec, te0, xx, pp, se0),
                      xe0, p)
    _, vjpm = jax.vjp(lambda xx, pp: _call_f(spec, te0 + h / 2.0, xx, pp,
                                             sm), xm, p)
    _, vjp1 = jax.vjp(lambda xx, pp: _call_f(spec, te0 + h, xx, pp, se1),
                      xe1, p)
    x0b, p0b = vjp0(v0)
    xmb, pmb = vjpm(vm)
    x1b, p1b = vjp1(v1)

    ge0_ref[0, :, :D] = -WS - 0.5 * WH + x0b
    gm_ref[0, :, :D] = WH + xmb
    ge1_ref[0, :, :D] = WS - 0.5 * WH + x1b
    if D < ge0_ref.shape[-1]:          # static; see _kern_bwd
        ge0_ref[0, :, D:] = jnp.zeros_like(ge0_ref[0, :, D:])
        gm_ref[0, :, D:] = jnp.zeros_like(gm_ref[0, :, D:])
        ge1_ref[0, :, D:] = jnp.zeros_like(ge1_ref[0, :, D:])
    for j in range(NP):
        gp_ref[b, i, j] = p0b[j] + pmb[j] + p1b[j]


def _make_fe_pallas_sh(spec, block_n, pallas_backward):
    """Hermite–Simpson: block over the M = (N_f-1)/2 intervals with
    even/mid/even strided views; zero-weight rows mask padding."""
    M = (spec.N_f - 1) // 2
    block_k = int(min(block_n, max(8, ((M + 7) // 8) * 8)))
    n_blocks = -(-M // block_k)
    M_pad = n_blocks * block_k
    D_pad = max(128, -(-spec.D // 128) * 128)
    has_stim = spec.stim_f is not None
    S_w = int(spec.stim_f.shape[1]) if has_stim else 0
    S_pad = max(128, -(-max(S_w, 1) // 128) * 128)
    norm = spec.D * (spec.N_f - 1)
    NP = spec.NP

    rows_need = 2 * M_pad + 1

    def _pad_rows(X, width_to):
        extra = rows_need - X.shape[0]
        if extra:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[-1:], (extra,) + X.shape[1:])],
                axis=0)
        return jnp.pad(X, ((0, 0), (0, width_to - X.shape[1])))

    NPest = spec.NPest
    # framework constants threaded as EXPLICIT custom_vmap arguments: a
    # custom_vmap'd function must not close over array constants (its
    # jaxpr consts) — under a vmapped lax.while_loop (the L-BFGS inner
    # loop) JAX instantiates such consts as batched and custom_vmap's
    # ClosedRule asserts on them. The rule slices [0] off any
    # batched-broadcast constant instead.
    pbase_c = jnp.asarray(np.asarray(spec.P_base, np.float64))
    pidx_c = jnp.asarray(np.asarray(spec.pidx, np.int32))
    stim_c = (jnp.asarray(np.asarray(spec.stim_f, np.float64))
              if has_stim else jnp.zeros((1, 1)))

    def _merge(pest, pbase, pidx, dtype):
        P = pbase.astype(dtype)
        if NPest:
            P = P.at[pidx].set(pest.astype(dtype))
        return P

    def _views(Xp):
        return Xp[0:-1:2][:M_pad], Xp[1::2][:M_pad], Xp[2::2][:M_pad]

    def _weights(rf, dtype):
        rf = jnp.asarray(rf, dtype)
        if rf.ndim == 0:
            ws = jnp.broadcast_to(rf, (M, spec.D)).astype(dtype)
            wh = ws
        else:
            ws = rf[: 2 * M: 2].astype(dtype)
            wh = rf[1: 2 * M: 2].astype(dtype)

        def padw(w):
            w = jnp.concatenate(
                [w, jnp.zeros((M_pad - M, spec.D), dtype)], axis=0)
            return jnp.pad(w, ((0, 0), (0, D_pad - spec.D)))

        return padw(ws), padw(wh)

    xblk = pl.BlockSpec((block_k, D_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((block_k, S_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def _args(X, rf, dtype, stim):
        Xp = _pad_rows(X, D_pad)
        xe0, xm, xe1 = _views(Xp)
        args, specs = [xe0, xm, xe1], [xblk, xblk, xblk]
        if has_stim:
            Sp = _pad_rows(stim.astype(dtype), S_pad)
            args += list(_views(Sp))
            specs += [sblk, sblk, sblk]
        ws, wh = _weights(rf, dtype)
        args += [ws, wh]
        specs += [xblk, xblk]
        return args, specs

    def _forward_pallas(X, pest, rf, pbase, pidx, stim):
        dtype = X.dtype
        P = jnp.reshape(_merge(pest, pbase, pidx, dtype), (1, -1))
        args, specs = _args(X, rf, dtype, stim)
        kern = functools.partial(_kern_sh_fwd, spec, has_stim)
        partials = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1), dtype),
            interpret=_INTERPRET[0],
        )(*args, P)
        return jnp.sum(partials) / norm

    def _backward_pallas(X, pest, rf, g, pbase, pidx, stim):
        dtype = X.dtype
        P = jnp.reshape(_merge(pest, pbase, pidx, dtype), (1, -1))
        args, specs = _args(X, rf, dtype, stim)
        np_out = max(NP, 1)
        kern = functools.partial(_kern_sh_bwd, spec, NP, has_stim)
        ge0, gm, ge1, gp_parts = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(xblk, xblk, xblk,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((n_blocks, np_out), dtype)),
            interpret=_INTERPRET[0],
        )(*args, P)
        scale = 2.0 * g / norm
        ge0 = ge0[:M, : spec.D]
        gm = gm[:M, : spec.D]
        ge1 = ge1[:M, : spec.D]
        # recombine overlapping even-node contributions with one shift-add
        zeros = jnp.zeros((1, spec.D), dtype)
        g_even = (jnp.concatenate([ge0, zeros], axis=0)
                  + jnp.concatenate([zeros, ge1], axis=0))   # (M+1, D)
        gx = jnp.zeros((spec.N_f, spec.D), dtype)
        gx = gx.at[0::2].set(g_even).at[1::2].set(gm)
        gx = scale * gx
        gp_full = scale * jnp.sum(gp_parts, axis=0)[:NP]
        gpest = (gp_full[pidx] if NPest else jnp.zeros((0,), dtype))
        return gx, gpest

    # ---- batched variants: ensemble batch as a LEADING GRID AXIS -------
    bxblk = pl.BlockSpec((1, block_k, D_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    shared_xblk = pl.BlockSpec((block_k, D_pad), lambda b, i: (i, 0),
                               memory_space=pltpu.VMEM)
    shared_sblk = pl.BlockSpec((block_k, S_pad), lambda b, i: (i, 0),
                               memory_space=pltpu.VMEM)

    def _pad_rows_b(X, width_to):
        extra = rows_need - X.shape[1]
        if extra:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[:, -1:],
                                     (X.shape[0], extra) + X.shape[2:])],
                axis=1)
        return jnp.pad(X, ((0, 0), (0, 0), (0, width_to - X.shape[2])))

    def _args_b(Xb, rf, dtype, stim):
        Xp = _pad_rows_b(Xb, D_pad)
        xe0 = Xp[:, 0:-1:2][:, :M_pad]
        xm = Xp[:, 1::2][:, :M_pad]
        xe1 = Xp[:, 2::2][:, :M_pad]
        args, specs = [xe0, xm, xe1], [bxblk, bxblk, bxblk]
        if has_stim:
            Sp = _pad_rows(stim.astype(dtype), S_pad)
            args += list(_views(Sp))
            specs += [shared_sblk, shared_sblk, shared_sblk]
        ws, wh = _weights(rf, dtype)
        args += [ws, wh]
        specs += [shared_xblk, shared_xblk]
        return args, specs

    def _pblk():
        # whole (B, NP) parameter table resident in VMEM (tiny); kernels
        # dynamic-slice their member's row
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def _forward_pallas_b(Xb, pestb, rf, pbase, pidx, stim):
        dtype = Xb.dtype
        B = Xb.shape[0]
        Pb = jax.vmap(lambda pe: _merge(pe, pbase, pidx, dtype))(pestb)
        args, specs = _args_b(Xb, rf, dtype, stim)
        kern = functools.partial(_kern_sh_fwd_b, spec, has_stim)
        partials = pl.pallas_call(
            kern,
            grid=(B, n_blocks),
            in_specs=specs + [_pblk()],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_blocks), dtype),
            interpret=_INTERPRET[0],
        )(*args, Pb)
        return jnp.sum(partials, axis=1) / norm

    def _backward_pallas_b(Xb, pestb, rf, gb, pbase, pidx, stim):
        dtype = Xb.dtype
        B = Xb.shape[0]
        Pb = jax.vmap(lambda pe: _merge(pe, pbase, pidx, dtype))(pestb)
        args, specs = _args_b(Xb, rf, dtype, stim)
        np_out = max(NP, 1)
        kern = functools.partial(_kern_sh_bwd_b, spec, NP, has_stim)
        ge0, gm, ge1, gp_parts = pl.pallas_call(
            kern,
            grid=(B, n_blocks),
            in_specs=specs + [_pblk()],
            out_specs=(bxblk, bxblk, bxblk,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((B, M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((B, M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((B, M_pad, D_pad), dtype),
                       jax.ShapeDtypeStruct((B, n_blocks, np_out), dtype)),
            interpret=_INTERPRET[0],
        )(*args, Pb)
        scale = (2.0 * gb / norm)[:, None, None]
        ge0 = ge0[:, :M, : spec.D]
        gm = gm[:, :M, : spec.D]
        ge1 = ge1[:, :M, : spec.D]
        zeros = jnp.zeros((B, 1, spec.D), dtype)
        g_even = (jnp.concatenate([ge0, zeros], axis=1)
                  + jnp.concatenate([zeros, ge1], axis=1))   # (B, M+1, D)
        gx = jnp.zeros((B, spec.N_f, spec.D), dtype)
        gx = gx.at[:, 0::2].set(g_even).at[:, 1::2].set(gm)
        gx = scale * gx
        gp_full = (2.0 * gb / norm)[:, None] * jnp.sum(gp_parts,
                                                       axis=1)[:, :NP]
        gpest = (gp_full[:, pidx]
                 if NPest else jnp.zeros((B, 0), dtype))
        return gx, gpest

    # ---- custom_vjp whose fwd/bwd carry custom_vmap rules --------------
    # Under a plain vmap (the ensemble path) the SH kernels dispatch to
    # the batched-grid implementations so the batch lands on the kernel
    # grid, not inside the block (the round-2 0.26x vmap loss). Rare
    # shapes (per-member rf, nested vmap, NP == 0) fall back to a
    # sequential lax.map of the single-member kernel.
    from jax.custom_batching import custom_vmap

    def _fe_xla(X, pest, rf):
        P = _action.merge_params(spec, pest, X.dtype)
        return _action.model_error(spec, X, P, rf)

    def _unb(v, is_batched):
        return v[0] if is_batched else v

    fwd_any = custom_vmap(_forward_pallas)

    @fwd_any.def_vmap
    def _fwd_rule(axis_size, in_batched, X, pest, rf, pbase, pidx, stim):
        xb, pb, rb, bb, ib, sb = in_batched
        pbase_, pidx_, stim_ = (_unb(pbase, bb), _unb(pidx, ib),
                                _unb(stim, sb))
        if not rb and xb and jnp.ndim(X) == 3 and spec.NP > 0:
            return _forward_pallas_b(X, _bcast(pest, pb, axis_size), rf,
                                     pbase_, pidx_, stim_), True
        out = jax.lax.map(
            lambda a: _forward_pallas(*a, pbase_, pidx_, stim_),
            (_bcast(X, xb, axis_size), _bcast(pest, pb, axis_size),
             _bcast(rf, rb, axis_size)))
        return out, True

    bwd_any = custom_vmap(_backward_pallas)

    @bwd_any.def_vmap
    def _bwd_rule(axis_size, in_batched, X, pest, rf, g, pbase, pidx,
                  stim):
        xb, pb, rb, gb, bb, ib, sb = in_batched
        pbase_, pidx_, stim_ = (_unb(pbase, bb), _unb(pidx, ib),
                                _unb(stim, sb))
        if not rb and xb and jnp.ndim(X) == 3 and spec.NP > 0:
            return (_backward_pallas_b(X, _bcast(pest, pb, axis_size), rf,
                                       _bcast(g, gb, axis_size),
                                       pbase_, pidx_, stim_),
                    (True, True))
        out = jax.lax.map(
            lambda a: _backward_pallas(*a, pbase_, pidx_, stim_),
            (_bcast(X, xb, axis_size), _bcast(pest, pb, axis_size),
             _bcast(rf, rb, axis_size), _bcast(g, gb, axis_size)))
        return out, (True, True)

    @jax.custom_vjp
    def fe(X, pest, rf):
        return fwd_any(X, pest, rf, pbase_c, pidx_c, stim_c)

    def fwd(X, pest, rf):
        out = fwd_any(X, pest, rf, pbase_c, pidx_c, stim_c)
        return out, (X, pest, rf, out)

    def bwd(res, g):
        X, pest, rf, fe_val = res
        rf_a = jnp.asarray(rf)
        if pallas_backward:
            gx, gpest = bwd_any(X, pest, rf, g, pbase_c, pidx_c, stim_c)
        else:
            gx, gpest = jax.grad(_fe_xla, argnums=(0, 1))(X, pest, rf)
            gx, gpest = g * gx, g * gpest
        if rf_a.ndim == 0:
            # FE is linear in a scalar rf: dFE/drf = FE / rf, for free
            grf = g * fe_val / rf_a
        else:
            grf = g * jax.grad(_fe_xla, argnums=2)(X, pest, rf)
        return gx, gpest, grf

    fe.defvjp(fwd, bwd)
    return fe


def _bcast(v, is_batched, axis_size):
    if is_batched:
        return v
    v = jnp.asarray(v)
    return jnp.broadcast_to(v, (axis_size,) + v.shape)


def _wrap_custom_vjp(spec, _forward_pallas, _backward_pallas,
                     pallas_backward):
    """Plain custom_vjp (one-step discs): vmap folds the batch into the
    kernel block, which is the measured-WIN layout at D >= 256 (PARITY
    A/B table). The SH builder wires its own batched-grid custom_vmap."""
    def _fe_xla(X, pest, rf):
        P = _action.merge_params(spec, pest, X.dtype)
        return _action.model_error(spec, X, P, rf)

    @jax.custom_vjp
    def fe(X, pest, rf):
        return _forward_pallas(X, pest, rf)

    def fwd(X, pest, rf):
        out = _forward_pallas(X, pest, rf)
        return out, (X, pest, rf, out)

    def bwd(res, g):
        X, pest, rf, fe_val = res
        rf_a = jnp.asarray(rf)
        if pallas_backward:
            gx, gpest = _backward_pallas(X, pest, rf, g)
        else:
            gx, gpest = jax.grad(_fe_xla, argnums=(0, 1))(X, pest, rf)
            gx, gpest = g * gx, g * gpest
        if rf_a.ndim == 0:
            # FE is linear in a scalar rf: dFE/drf = FE / rf, for free
            grf = g * fe_val / rf_a
        else:
            grf = g * jax.grad(_fe_xla, argnums=2)(X, pest, rf)
        return gx, gpest, grf

    fe.defvjp(fwd, bwd)
    return fe


# Auto-enable threshold, pinned by the measured A/B table in PARITY.md:
# real mini-ladders win 1.33x at D=400 (one-step discs, f32, batch 64,
# block 64) and lose 175x at D=20 (lane padding 20->128 dominates and
# per-iterate kernel launches break XLA's while_loop fusion). 256 is the
# smallest lane-tile multiple in the winning regime that was measured
# favourable forward+backward.
_AUTO_MIN_D = 256


def pallas_preferred(spec: ProblemSpec, rf, dtype=np.float32) -> bool:
    """Measured-win predicate for ``engine='auto'`` (PARITY.md A/B table).

    True only in the regime where the fused kernel beat XLA on REAL
    ladders: one-step discretizations, D >= 256, f32, on an actual
    accelerator backend. SimpsonHermite stays opt-in (its ladder loses
    under vmap: the batch folds into the kernel block and VMEM forces
    tiny blocks), as does everything on CPU (interpreter mode only).
    """
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return (platform != "cpu"
            and np.dtype(dtype) == np.float32
            and spec.disc in ("euler", "trapezoid", "forwardmap")
            and spec.D >= _AUTO_MIN_D
            and fe_supported(spec, rf))


def ag_preferred(spec: ProblemSpec, rf, dtype=np.float32) -> bool:
    """Measured-win predicate for the whole-problem fused action+grad
    kernel (kernels/ag_pallas.py) under ``engine='auto'``.

    Measured on the chip (PARITY.md fused-iteration section): at the
    D=400 one-step batched config the ag kernel is 5.7x XLA and 2.3x
    the blocked FE kernel (7.9 vs 17.9 vs 45.1 us/member-eval at B=64),
    so it OWNS the D >= 256 one-step regime. At D=20/B=1 it is a wash
    in isolation and a net loss end-to-end (pack/unpack glue + 16% lane
    utilization); at D=20/B=256 XLA's full-tile batched fusion wins 7x;
    SimpsonHermite measures 0.56x at D=100/B=64 and exactly 1.0x at
    D=400/B=64 — so small D and SH stay on XLA."""
    from varanneal_tpu.kernels.ag_pallas import ag_supported
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return (platform != "cpu"
            and np.dtype(dtype) == np.float32
            and spec.disc in ("euler", "trapezoid", "forwardmap")
            and spec.D >= _AUTO_MIN_D
            and ag_supported(spec, rf, dtype))


def select_action(spec: ProblemSpec, rf, engine: str = "auto",
                  dtype=np.float32, block_n: int = 64,
                  pallas_backward: bool = True):
    """Pick the action implementation: ``'xla'``, ``'pallas'`` (blocked
    FE kernel, forced), ``'ag'`` (whole-problem fused action+grad
    kernel, forced), or ``'auto'`` (each Pallas engine only in its
    measured-win regime, see :func:`pallas_preferred` /
    :func:`ag_preferred`). Returns the same ``(action, action_parts)``
    contract as ``ops.action.make_action``."""
    if engine not in ("auto", "xla", "pallas", "ag"):
        raise ValueError(
            f"engine must be auto/xla/pallas/ag, got {engine!r}")
    # forced engines on unsupported problems fail CLEARLY at build time
    # (round-4: previously a time-dep-P spec raised an opaque reshape
    # TypeError from inside the kernel prep). The support matrix
    # (varanneal_tpu/support.py, PARITY.md) documents every cell.
    if engine == "pallas" and not fe_supported(spec, rf):
        raise ValueError(
            "engine='pallas' unsupported for this problem (time-"
            "dependent parameters / rf rank / non-uniform grid — see "
            "the PARITY.md feature x engine support matrix)")
    if engine == "ag":
        from varanneal_tpu.kernels.ag_pallas import ag_supported as _ag
        if not _ag(spec, rf, dtype):
            raise ValueError(
                "engine='ag' unsupported for this problem (time-"
                "dependent parameters / dtype / rf or RM rank / non-"
                "uniform grid / padded state exceeds VMEM — see the "
                "PARITY.md feature x engine support matrix)")
    if engine == "ag" or (engine == "auto"
                          and ag_preferred(spec, rf, dtype)):
        from varanneal_tpu.kernels.ag_pallas import make_action_ag
        act, parts = make_action_ag(spec)
        act.engine = "ag"
    elif engine == "pallas" or (engine == "auto"
                                and pallas_preferred(spec, rf, dtype)):
        act, parts = make_action_pallas(spec, block_n=block_n,
                                        pallas_backward=pallas_backward)
        act.engine = "pallas"
    else:
        act, parts = _action.make_action(spec)
        act.engine = "xla"
    return act, parts


def make_action_pallas(spec: ProblemSpec, block_n: int = 512,
                       pallas_backward: bool = True):
    """Action with the Pallas FE forward (ME stays in XLA — it is a cheap
    strided gather). Same (action, action_parts) contract as
    ``ops.action.make_action``; falls back to XLA where unsupported.

    VMEM note: under ``vmap`` the batch folds into the kernel block, so
    per-invocation VMEM scales with batch × block_n — shrink ``block_n``
    (or set ``pallas_backward=False``: the backward has ~2x the block
    traffic of the forward) for large vmapped ensembles."""
    fe = make_fe_pallas(spec, block_n=block_n,
                        pallas_backward=pallas_backward)

    def action_parts(XP, rf):
        X, _ = _action.unpack(spec, XP)
        pest = XP[spec.n_state:]
        me = _action.measurement_error(spec, X)
        fe_v = fe(X, pest, rf)
        return me + fe_v, me, fe_v

    def action(XP, rf):
        return action_parts(XP, rf)[0]

    return action, action_parts
