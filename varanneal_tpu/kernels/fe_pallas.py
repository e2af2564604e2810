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

- the one-row stencil halo is expressed as TWO standard-blocked inputs —
  the shifted views X[:-1] and X[1:] — instead of manual halo DMA
  (unaligned HBM->VMEM slices violate the 128-lane tiling rule, and manual
  DMA forfeits Mosaic's automatic double-buffered pipelining);
- arrays are lane-padded to the 128 tile outside; compute value-slices back
  to the real D columns;
- per-block partial sums land in a full-array SMEM output, one row per
  grid step (per-block (1,1) blocking violates the block-shape rule).

Scope (v1): euler/trapezoid/forwardmap discretizations, scalar or
(N_f-1, D)-diagonal rf, time-independent parameters, no stimulus. The
general path (``ops.action.model_error``) remains the fallback; use
:func:`fe_supported` to test eligibility. Gradients: custom_vjp with the
backward pass expressed in plain JAX (XLA-fused); a Pallas backward is the
next optimization step.

Correctness is tested in interpreter mode on CPU against the oracle-pinned
XLA path (tests/test_pallas.py) and re-verified on real TPU hardware; the
kernel must win a real-TPU benchmark against the XLA path before being
preferred (bench.py with BENCH_PALLAS=1).
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


def fe_supported(spec: ProblemSpec, rf) -> bool:
    """Is the fused Pallas FE kernel applicable to this problem?"""
    rf = np.asarray(rf)
    return (spec.disc in ("euler", "trapezoid", "forwardmap")
            and spec.stim_f is None
            and not spec.time_dep_p
            and rf.ndim in (0, 2))


def _block_residual(spec: ProblemSpec, x_n, x_np1, p):
    """Discretization residual rows given the two shifted state blocks."""
    h = spec.dt
    # t is unused by the built-in autonomous models; pass zeros (the
    # general XLA path handles explicitly time-dependent f)
    t = jnp.zeros((x_n.shape[0],), x_n.dtype)
    fn = spec.f(t, x_n, p)
    if spec.disc == "trapezoid":
        fnp1 = spec.f(t, x_np1, p)
        return x_np1 - x_n - (h / 2.0) * (fn + fnp1)
    if spec.disc == "euler":
        return x_np1 - x_n - h * fn
    return x_np1 - fn          # forwardmap


def _kern_scalar(spec, block_n, x0_ref, x1_ref, p_ref, rf_ref, out_ref):
    i = pl.program_id(0)
    x_n = x0_ref[:, : spec.D]
    x_np1 = x1_ref[:, : spec.D]
    r = _block_residual(spec, x_n, x_np1, p_ref[0])
    row0 = i * block_n
    valid = (row0 + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
             < spec.N_f - 1).astype(r.dtype)
    out_ref[i, 0] = rf_ref[0, 0] * jnp.sum(valid * r * r)


def _kern_diag(spec, block_n, x0_ref, x1_ref, p_ref, rf_ref, out_ref):
    i = pl.program_id(0)
    x_n = x0_ref[:, : spec.D]
    x_np1 = x1_ref[:, : spec.D]
    r = _block_residual(spec, x_n, x_np1, p_ref[0])
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


def _kern_bwd(spec, block_n, NP,
              xprev_ref, xmid_ref, xnext_ref, wprev_ref, wcur_ref, p_ref,
              gx_ref, gp_ref):
    """Backward block: gradient rows m in [i*B, (i+1)*B).

    Inputs are shifted views so row j of the block sees x_{m-1}, x_m,
    x_{m+1} and the weight rows w_{m-1}, w_m (zero rows encode the
    boundary / padding, so no explicit masks are needed)."""
    i = pl.program_id(0)
    D = spec.D
    a1, c0, c1 = _disc_coeffs(spec)
    x_prev = xprev_ref[:, :D]
    x_mid = xmid_ref[:, :D]
    x_next = xnext_ref[:, :D]
    w_prev = wprev_ref[:, :D]
    w_cur = wcur_ref[:, :D]
    p = p_ref[0]

    wr_prev = w_prev * _block_residual(spec, x_prev, x_mid, p)
    wr_cur = w_cur * _block_residual(spec, x_mid, x_next, p)
    v = c0 * wr_prev + c1 * wr_cur

    t = jnp.zeros((x_mid.shape[0],), x_mid.dtype)
    _, f_vjp = jax.vjp(lambda xx, pp: spec.f(t, xx, pp), x_mid, p)
    xbar, pbar = f_vjp(v)

    gx = wr_prev - a1 * wr_cur - xbar
    gx_ref[:, :D] = gx
    gx_ref[:, D:] = jnp.zeros_like(gx_ref[:, D:])
    for j in range(NP):
        gp_ref[i, j] = -pbar[j]


def make_fe_pallas(spec: ProblemSpec, block_n: int = 512,
                   pallas_backward: bool = True) -> Callable:
    """Build ``fe(X, pest, rf) -> scalar`` with a fused Pallas forward and a
    fused Pallas backward (custom_vjp). ``rf``: scalar or (N_f-1, D)."""
    n_res = spec.N_f - 1
    block_n = int(min(block_n, max(8, ((n_res + 7) // 8) * 8)))
    n_blocks = -(-n_res // block_n)
    rows_pad = n_blocks * block_n          # rows of the shifted views
    D_pad = max(128, -(-spec.D // 128) * 128)

    def _pad(X):
        extra = (rows_pad + 1) - spec.N_f
        if extra:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[-1:], (extra, spec.D))], axis=0)
        return jnp.pad(X, ((0, 0), (0, D_pad - spec.D)))

    norm = spec.D * (spec.N_f - 1)
    xblk = pl.BlockSpec((block_n, D_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def _forward_pallas(X, pest, rf):
        dtype = X.dtype
        P = jnp.reshape(_action.merge_params(spec, pest, dtype), (1, -1))
        Xp = _pad(X)
        x0, x1 = Xp[:-1], Xp[1:]
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
            kern = functools.partial(_kern_scalar, spec, block_n)
            partials = pl.pallas_call(
                kern,
                in_specs=[xblk, xblk,
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                **common,
            )(x0, x1, P, jnp.reshape(rf, (1, 1)))
        else:
            pad = rows_pad - n_res
            rf_arr = jnp.concatenate(
                [rf.astype(dtype), jnp.zeros((pad, spec.D), dtype)], axis=0)
            rf_arr = jnp.pad(rf_arr, ((0, 0), (0, D_pad - spec.D)))
            kern = functools.partial(_kern_diag, spec, block_n)
            partials = pl.pallas_call(
                kern,
                in_specs=[xblk, xblk,
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((block_n, D_pad), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                **common,
            )(x0, x1, P, rf_arr)
        return jnp.sum(partials) / norm

    # ---------------- backward (fused Pallas adjoint) -------------------
    NP = spec.NP
    n_blocks_g = -(-spec.N_f // block_n)
    rows_g = n_blocks_g * block_n
    gblk = pl.BlockSpec((block_n, D_pad), lambda i: (i, 0),
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
        kern = functools.partial(_kern_bwd, spec, block_n, NP)
        gx_pad, gp_parts = pl.pallas_call(
            kern,
            grid=(n_blocks_g,),
            in_specs=[gblk, gblk, gblk, gblk, gblk,
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(gblk,
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((rows_g, D_pad), dtype),
                       jax.ShapeDtypeStruct((n_blocks_g, np_out), dtype)),
            interpret=_INTERPRET[0],
        )(x_prev, x_mid, x_next, w_prev, w_cur, P)
        scale = 2.0 * g / norm
        gx = scale * gx_pad[: spec.N_f, : spec.D]
        gp_full = scale * jnp.sum(gp_parts, axis=0)[:NP]
        gpest = (gp_full[np.asarray(spec.pidx, np.int32)]
                 if spec.NPest else jnp.zeros((0,), dtype))
        return gx, gpest

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


def make_action_pallas(spec: ProblemSpec):
    """Action with the Pallas FE forward (ME stays in XLA — it is a cheap
    strided gather). Same (action, action_parts) contract as
    ``ops.action.make_action``; falls back to XLA where unsupported."""
    fe = make_fe_pallas(spec)

    def action_parts(XP, rf):
        X, _ = _action.unpack(spec, XP)
        pest = XP[spec.n_state:]
        me = _action.measurement_error(spec, X)
        fe_v = fe(X, pest, rf)
        return me + fe_v, me, fe_v

    def action(XP, rf):
        return action_parts(XP, rf)[0]

    return action, action_parts
