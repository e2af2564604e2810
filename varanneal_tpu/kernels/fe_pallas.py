"""Pallas TPU kernel: fused model-error (FE) residual assembly + quadratic
accumulation over the (N_f, D) state-time plane.

This is the hot op of the whole framework (BASELINE north star: "residual
assembly in Pallas"): every L-BFGS iteration evaluates FE and its gradient.
The kernel streams time-blocks of X from HBM into VMEM with a one-row halo,
evaluates the user vector field f INSIDE the kernel (f is jnp-traceable, so
Mosaic lowers it), forms the discretization residual, contracts with the
annealed precision, and accumulates a per-block partial sum — one pass over
HBM, no materialized (N, D) residual/f arrays.

Scope (v1): euler/trapezoid/forwardmap discretizations, scalar or
(N_f-1, D)-diagonal rf, time-independent parameters, no stimulus. The
general path (``ops.action.model_error``) remains the fallback; use
:func:`fe_supported` to test eligibility. Gradients: custom_vjp with the
backward pass expressed in plain JAX (XLA-fused); a Pallas backward is the
next optimization step.

Correctness is tested in interpreter mode on CPU against the oracle-pinned
XLA path (tests/test_pallas.py); the kernel must win a real-TPU benchmark
against the XLA path before being preferred (bench.py with BENCH_PALLAS=1).
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


def _residual(spec: ProblemSpec, ts, x, p):
    """Discretization residual on a (B+1, D) block (B residual rows)."""
    h = spec.dt
    f_all = spec.f(ts, x, p)
    if spec.disc == "trapezoid":
        return x[1:] - x[:-1] - (h / 2.0) * (f_all[:-1] + f_all[1:])
    if spec.disc == "euler":
        return x[1:] - x[:-1] - h * f_all[:-1]
    return x[1:] - f_all[:-1]          # forwardmap


def _kern_scalar(spec, block_n, x_hbm, p_ref, rf_ref, out_ref, xs, sem):
    i = pl.program_id(0)
    B = block_n
    row0 = i * B
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, B + 1), :], xs, sem)
    cp.start()
    cp.wait()
    # lane-padded load; compute on the real D columns only
    x = xs[:, : spec.D]
    dtype = x.dtype
    t0 = jnp.asarray(float(spec.t_f[0]), dtype)
    gdt = jnp.asarray(float(spec.t_f[1] - spec.t_f[0]), dtype)
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (B + 1, 1), 0)[:, 0]
    ts = t0 + gdt * rows.astype(dtype)
    r = _residual(spec, ts, x, p_ref[0])
    valid = (row0 + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
             < spec.N_f - 1).astype(dtype)
    out_ref[0, 0] = rf_ref[0, 0] * jnp.sum(valid * r * r)


def _kern_diag(spec, block_n, x_hbm, p_ref, rf_hbm, out_ref, xs, rfs, sem):
    i = pl.program_id(0)
    B = block_n
    row0 = i * B
    cp_x = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, B + 1), :], xs,
                                 sem.at[0])
    cp_x.start()
    cp_r = pltpu.make_async_copy(rf_hbm.at[pl.ds(row0, B), :], rfs,
                                 sem.at[1])
    cp_r.start()
    cp_x.wait()
    cp_r.wait()
    x = xs[:, : spec.D]
    dtype = x.dtype
    t0 = jnp.asarray(float(spec.t_f[0]), dtype)
    gdt = jnp.asarray(float(spec.t_f[1] - spec.t_f[0]), dtype)
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (B + 1, 1), 0)[:, 0]
    ts = t0 + gdt * rows.astype(dtype)
    r = _residual(spec, ts, x, p_ref[0])
    valid = (row0 + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
             < spec.N_f - 1).astype(dtype)
    out_ref[0, 0] = jnp.sum(rfs[:, : spec.D] * valid * r * r)


def make_fe_pallas(spec: ProblemSpec, block_n: int = 256) -> Callable:
    """Build ``fe(X, pest, rf) -> scalar`` with a fused Pallas forward and a
    plain-JAX backward (custom_vjp). ``rf``: scalar or (N_f-1, D).

    Arrays are lane-padded to the TPU 128-lane tile before entering the
    kernel (Mosaic requires DMA slices aligned to the tiling); compute
    slices back to the real D columns.
    """
    n_res = spec.N_f - 1
    block_n = int(min(block_n, max(8, ((n_res + 7) // 8) * 8)))
    n_blocks = -(-n_res // block_n)
    N_padded = n_blocks * block_n + 1
    D_pad = max(128, -(-spec.D // 128) * 128)

    def _pad_x(X):
        pad = N_padded - spec.N_f
        if pad:
            X = jnp.concatenate(
                [X, jnp.broadcast_to(X[-1:], (pad, spec.D))], axis=0)
        return jnp.pad(X, ((0, 0), (0, D_pad - spec.D)))

    norm = spec.D * (spec.N_f - 1)

    def _forward_pallas(X, pest, rf):
        dtype = X.dtype
        P = jnp.reshape(
            _action.merge_params(spec, pest, dtype), (1, -1))
        Xp = _pad_x(X)
        rf = jnp.asarray(rf, dtype)
        scalar_rf = rf.ndim == 0
        common = dict(
            grid=(n_blocks,),
            out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1), dtype),
            interpret=_INTERPRET[0],
        )
        if scalar_rf:
            kern = functools.partial(_kern_scalar, spec, block_n)
            partials = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_n + 1, D_pad), dtype),
                    pltpu.SemaphoreType.DMA,
                ],
                **common,
            )(Xp, P, jnp.reshape(rf, (1, 1)))
        else:
            pad = (N_padded - 1) - n_res
            rf_arr = jnp.concatenate(
                [rf.astype(dtype), jnp.zeros((pad, spec.D), dtype)], axis=0)
            rf_arr = jnp.pad(rf_arr, ((0, 0), (0, D_pad - spec.D)))
            kern = functools.partial(_kern_diag, spec, block_n)
            partials = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_n + 1, D_pad), dtype),
                    pltpu.VMEM((block_n, D_pad), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                **common,
            )(Xp, P, rf_arr)
        return jnp.sum(partials) / norm

    def _fe_xla(X, pest, rf):
        P = _action.merge_params(spec, pest, X.dtype)
        return _action.model_error(spec, X, P, rf)

    @jax.custom_vjp
    def fe(X, pest, rf):
        return _forward_pallas(X, pest, rf)

    def fwd(X, pest, rf):
        return _forward_pallas(X, pest, rf), (X, pest, rf)

    def bwd(res, g):
        X, pest, rf = res
        gx, gp, grf = jax.grad(_fe_xla, argnums=(0, 1, 2))(X, pest, rf)
        return (g * gx, g * gp,
                jax.tree_util.tree_map(lambda a: g * a, grf))

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
