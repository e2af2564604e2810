"""Fused Pallas kernel for the L-BFGS compact-form direction.

Motivation (PARITY.md roofline): the canonical-config ladder is
SERIALIZATION-bound — each L-BFGS iteration is a chain of tens of small
kernels whose fixed launch cost dominates at small working sets. The
direction computation (``opt/lbfgs.py :: _compact_dir``) is the longest
sub-chain: one (2m, n) Gram matmul, one history matvec, 5x5 gathers,
two TriangularSolve custom calls, a scatter, and a closing matvec.
This kernel computes the ENTIRE direction in ONE Pallas launch per
member: the Gram, the chronological reordering (one-hot matmuls — no
gather/scatter), the unrolled (m, m) triangular solves, and the final
contraction all happen in VMEM.

Semantics are identical to ``_compact_dir`` (tested against it and the
two-loop recursion): given the JOINT circular history H (rows [0, m) the
steps s_i, rows [m, 2m) the grad-diffs y_i), gradient g, write head and
valid length, return d = -Hinv g with

    Hinv = gI + [S gY] [[R^{-T}(D+gY'Y)R^{-1}, -R^{-T}], [-R^{-1}, 0]] [S'; gY']

Supported: f32, flat decision vectors, any m <= 7 (the (2m+1) augmented
row block must fit one 16-row sublane tile). Batched members ride the
Pallas GRID (one program per member) via ``jax.custom_batching`` — the
history stays (2m, n) per member, exactly like the SH FE kernels.
Fallback for everything else is the XLA ``_compact_dir``.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


def _dir_kernel(m, rows, *refs):
    """One member: A_ref (1, rows, n_pad) augmented history (rows
    [0, 2m) = H, row 2m = g, rest zero-padded), hh_ref (1, 2) SMEM
    [head, hlen], d_ref (1, n_pad) output."""
    A_ref, hh_ref, d_ref = refs
    A = A_ref[0]                                  # (rows, n_pad)
    dtype = A.dtype
    head = hh_ref[0, 0]
    hlen = hh_ref[0, 1]

    def mm(x, y):
        # every matmul at HIGHEST precision: the MXU's default f32 path
        # rounds operands to bf16 (measured 3e-3 relative error on the
        # direction), and the one-hot selections must be exact
        return jnp.dot(x, y, preferred_element_type=dtype,
                       precision=lax.Precision.HIGHEST)

    G = mm(A, A.T)                                  # (rows, rows)

    # Everything below is SLICING-FREE and RANK-1-FREE (measured Mosaic
    # limits: sublane-offset slices and 1-D vector values both fail to
    # lower — "Not implemented: Offset change"). All block extraction
    # and reordering happens through one-hot SELECTION MATMULS built
    # straight from iota comparisons (both orientations constructed
    # directly — no transpose of data); every vector is a (1, m) row,
    # every scalar a (1, 1) matmul extraction; column sums are
    # ones-row matmuls.
    #
    # chronological order: slot ord[k] = (head + k) % m holds the k-th
    # oldest pair; the first m-hlen chronological positions are invalid
    kr = lax.broadcasted_iota(jnp.int32, (m, rows), 0)
    cr = lax.broadcasted_iota(jnp.int32, (m, rows), 1)
    ordk = (head + kr) % m
    SelS = (cr == ordk).astype(dtype)          # (m, rows): chron S rows
    SelY = (cr == ordk + m).astype(dtype)      # (m, rows): chron Y rows
    krT = lax.broadcasted_iota(jnp.int32, (rows, m), 1)
    crT = lax.broadcasted_iota(jnp.int32, (rows, m), 0)
    ordkT = (head + krT) % m
    SelS_T = (crT == ordkT).astype(dtype)      # (rows, m)
    SelY_T = (crT == ordkT + m).astype(dtype)
    kv_row = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    vf = (kv_row >= (m - hlen)).astype(dtype)  # (1, m) chron validity
    rr = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
    eg_row = (rr == 2 * m).astype(dtype)       # (1, rows) g-row selector

    GS = mm(G, SelS_T)                         # (rows, m)
    GY = mm(G, SelY_T)
    SY = mm(SelS, GY)                          # [i,j] = s_i . y_j (chron)
    SYT = mm(SelY, GS)                         # = SY.T (G symmetric)
    YY = mm(SelY, GY)
    vfc = ((lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            >= (m - hlen)).astype(dtype))      # (m, 1)
    mask2 = vfc * vf                           # (m, m) via broadcast
    SY = SY * mask2
    SYT = SYT * mask2
    YY = YY * mask2
    i2 = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j2 = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tri = (i2 <= j2).astype(dtype)
    eye = (i2 == j2).astype(dtype)
    inv_diag = eye * (1.0 - vfc)          # unit diag on invalid slots
    R = SY * tri + inv_diag
    RT = SYT * (i2 >= j2).astype(dtype) + inv_diag      # = R.T

    ones_row = jnp.ones((1, m), dtype)
    one_hot = [(kv_row == i).astype(dtype) for i in range(m)]  # (1, m)
    oh_col = [(lax.broadcasted_iota(jnp.int32, (m, 1), 0)
               == i).astype(dtype) for i in range(m)]          # (m, 1)
    diagSY_row = mm(ones_row, SY * eye)        # (1, m)
    diagR_row = mm(ones_row, R * eye)
    sy_new = mm(diagSY_row, oh_col[m - 1])     # (1, 1)
    yy_new = mm(mm(ones_row, YY * eye), oh_col[m - 1])
    gamma = jnp.where(hlen > 0,
                      sy_new / jnp.maximum(yy_new, 1e-30),
                      jnp.ones((1, 1), dtype))  # (1, 1)

    ag = mm(eg_row, G)                         # (1, rows) = g . rows
    a = mm(ag, SelS_T) * vf                    # (1, m) = S'g (chron)
    b = mm(ag, SelY_T) * vf

    # unrolled substitution (m static): R u = a (upper, back-sub).
    # Writes are one-hot adds; scalar reads are (1, m) @ (m, 1) matmuls;
    # the solved-prefix contribution is one row-matvec per step.
    u = jnp.zeros((1, m), dtype)
    for i in range(m - 1, -1, -1):
        Ru_i = mm(mm(u, RT), oh_col[i])        # (1,1): (R @ u')[i]
        a_i = mm(a, oh_col[i])
        d_i = mm(diagR_row, oh_col[i])
        u = u + one_hot[i] * ((a_i - Ru_i) / d_i)
    v = diagSY_row * u + gamma * mm(u, YY) - gamma * b  # YY symmetric
    # R^T w = v (lower, forward-sub): (R^T @ w')[i] = (w @ R)[i]
    w = jnp.zeros((1, m), dtype)
    for i in range(m):
        Rw_i = mm(mm(w, R), oh_col[i])
        v_i = mm(v, oh_col[i])
        d_i = mm(diagR_row, oh_col[i])
        w = w + one_hot[i] * ((v_i - Rw_i) / d_i)
    q1 = w * vf                                # (1, m)
    q2 = -u * vf

    # raw slot order + augmented-g row, as one (1, rows) row vector:
    # d = -[q1'SelS + g q2'SelY + g eg'] . A
    q_row = mm(q1, SelS) + gamma * mm(q2, SelY) + gamma * eg_row
    d_ref[:, :] = -mm(q_row, A)


def _dir_batched(m, Haug, hh):
    """Batched fused direction: Haug (B, rows, n_pad) f32 augmented
    history, hh (B, 2) int32 [head, hlen] -> d (B, n_pad)."""
    B, rows, n_pad = Haug.shape
    kern = functools.partial(_dir_kernel, m, rows)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, n_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad), Haug.dtype),
        interpret=_INTERPRET[0],
    )(Haug, hh)


def _pack(g, H, head, hlen, m):
    """(n,) g + (2m, n) H -> (1, rows, n_pad) augmented block + (1, 2)
    int32 scalars. rows = 16 keeps the sublane dim one f32 tile."""
    n = g.shape[0]
    n_pad = -(-n // 128) * 128
    rows = 16 if 2 * m + 1 <= 16 else (-(-(2 * m + 1) // 8) * 8)
    A = jnp.zeros((rows, n_pad), g.dtype)
    A = A.at[: 2 * m, :n].set(H)
    A = A.at[2 * m, :n].set(g)
    hh = jnp.stack([head.astype(jnp.int32),
                    hlen.astype(jnp.int32)])
    return A[None], hh[None]


@functools.partial(jax.custom_batching.custom_vmap)
def _dir_any(g, H, head, hlen):
    m = H.shape[0] // 2
    A, hh = _pack(g, H, head, hlen, m)
    d = _dir_batched(m, A, hh)
    return d[0, : g.shape[0]]


@_dir_any.def_vmap
def _dir_any_vmap(axis_size, in_batched, g, H, head, hlen):
    gb, Hb, hdb, hlb = in_batched
    B = axis_size

    def bc(v, isb):
        return v if isb else jnp.broadcast_to(v[None], (B,) + v.shape)

    g = bc(g, gb)
    H = bc(H, Hb)
    head = bc(head, hdb)
    hlen = bc(hlen, hlb)
    m = H.shape[1] // 2
    A, hh = jax.vmap(lambda gi, Hi, hd, hl: _pack(gi, Hi, hd, hl, m))(
        g, H, head, hlen)
    d = _dir_batched(m, A[:, 0], hh[:, 0])
    return d[:, : g.shape[1]], True


def compact_dir_pallas(g, H, head, hlen):
    """Fused-Pallas L-BFGS direction for a FLAT f32 decision vector.

    Drop-in for ``_compact_dir(g, H, rho, head, hlen, m, dtype)`` with
    rho unused; vmap dispatches every member to one Pallas grid step.
    """
    return _dir_any(g, H, head, hlen)


def pallas_dir_supported(leaves, m, dtype):
    """Predicate: the fused direction kernel applies (flat f32 vector on
    an accelerator backend, augmented rows fit one sublane tile)."""
    if len(leaves) != 1 or leaves[0].ndim != 1:
        return False
    if dtype != jnp.float32:
        return False
    if 2 * m + 1 > 16:
        return False
    if _INTERPRET[0]:      # test mode: interpreter runs anywhere
        return True
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:  # pragma: no cover
        return False
