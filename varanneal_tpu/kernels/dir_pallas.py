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
import jax.tree_util as jtu
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


def _mm_highest(x, y):
    # every matmul at HIGHEST precision: the MXU's default f32 path
    # rounds operands to bf16 (measured 3e-3 relative error on the
    # direction), and the one-hot selections must be exact
    return jnp.dot(x, y, preferred_element_type=x.dtype,
                   precision=lax.Precision.HIGHEST)


def _splat(v, shape):
    """Broadcast a scalar OR (1, 1) vector value to ``shape``. Mosaic
    cannot broadcast a (1, 1) across sublanes and lanes in one op
    ("Broadcast in both sublanes and lanes", measured), and a two-step
    broadcast_to chain gets CANONICALIZED back into the unsupported
    single op (measured) — so splat through two outer-product matmuls,
    which nothing folds. Integer payloads here are tiny (< m), exact in
    f32. SMEM scalars splat implicitly and pass through."""
    if getattr(v, "ndim", 0) == 2:
        f = jnp.float32
        row = _mm_highest(v.astype(f), jnp.ones((1, shape[1]), f))
        out = _mm_highest(jnp.ones((shape[0], 1), f), row)
        return out.astype(v.dtype)
    return v


def _dir_math(A, head, hlen, m, rows):
    """Shared in-VMEM direction math: A (rows, n_pad) augmented history
    (rows [0, 2m) = H circular pairs, row 2m = g, rest zero-padded),
    head/hlen (SMEM scalars or (1, 1) vector values) -> d (1, n_pad).
    Rank-2 and slicing-free throughout (measured Mosaic limits — see
    kernel docstrings)."""
    dtype = A.dtype
    mm = _mm_highest

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
    # oldest pair; the first m-hlen chronological positions are invalid.
    # The modulus must be an int32 ARRAY: with x64 enabled a python-int
    # operand of % materializes an i64[] constant whose i64->i32 convert
    # sends Mosaic's _convert_helper into infinite recursion (measured).
    m_i = jnp.asarray(m, jnp.int32)
    kr = lax.broadcasted_iota(jnp.int32, (m, rows), 0)
    cr = lax.broadcasted_iota(jnp.int32, (m, rows), 1)
    ordk = (_splat(head, (m, rows)) + kr) % m_i
    SelS = (cr == ordk).astype(dtype)          # (m, rows): chron S rows
    SelY = (cr == ordk + m).astype(dtype)      # (m, rows): chron Y rows
    krT = lax.broadcasted_iota(jnp.int32, (rows, m), 1)
    crT = lax.broadcasted_iota(jnp.int32, (rows, m), 0)
    ordkT = (_splat(head, (rows, m)) + krT) % m_i
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
    return -mm(q_row, A)


def _dir_kernel(m, rows, *refs):
    """One member: A_ref (1, rows, n_pad) augmented history (rows
    [0, 2m) = H, row 2m = g, rest zero-padded), hh_ref (1, 1, 2) SMEM
    [head, hlen], d_ref (1, 1, n_pad) output. Small per-member arrays
    are 3-D (B, 1, k): Mosaic requires the LAST TWO block dims to be
    tile-divisible or equal to the array dims, which a (1, k) block of
    a (B, k) array violates for B > 1 (measured)."""
    A_ref, hh_ref, d_ref = refs
    d_ref[0] = _dir_math(A_ref[0], hh_ref[0, 0, 0], hh_ref[0, 0, 1],
                         m, rows)


def _step_kernel(m, rows, *refs):
    """One member, post-line-search FUSED STEP: history update +
    termination scalars + NEXT direction in a single launch (the
    roofline diagnosis is serialization — PARITY.md: each L-BFGS
    iteration is a chain of tens of small kernels; this collapses
    everything between two line searches into one).

      A_ref (1, rows, n_pad): rows [0, 2m) = circular H, row 2m = g
          (stale; rewritten each call). ALIASED to A_out.
      V_ref (1, 8, n_pad): row 0 x_old, 1 x_new, 2 g_old, 3 g_new.
      sc_ref (1, 1, 3) SMEM int32: [head, hlen, ls_ok].
      A_out (1, rows, n_pad): updated history, row 2m = g_new.
      d_ref (1, 1, n_pad): next search direction, bad-direction
          fallback (-g on non-descent) already applied.
      s_ref (1, 1, 128) f32: [good, pgn, gnorm1, head_new, hlen_new,
          sy]. (3-D small blocks: see _dir_kernel note.)

    All scalar logic stays in the VECTOR domain as (1, 1) values (a
    vector->SMEM scalar move does not lower; SMEM->vector broadcasts
    do), and `_dir_math` consumes head/hlen as (1, 1) via broadcasting.
    """
    A_ref, V_ref, sc_ref, A_out, d_ref, s_ref = refs
    A = A_ref[0]                                   # (rows, n_pad)
    V = V_ref[0]                                   # (8, n_pad)
    dtype = A.dtype
    mm = _mm_highest
    n_pad = A.shape[1]

    one11 = jnp.ones((1, 1), dtype)
    head11 = sc_ref[0, 0, 0] * jnp.ones((1, 1), jnp.int32)
    hlen11 = sc_ref[0, 0, 1] * jnp.ones((1, 1), jnp.int32)
    lsok11 = jnp.where(sc_ref[0, 0, 2] > 0, one11, 0.0 * one11)

    # row extraction from V via one-hot matmuls (slicing-free)
    rv = lax.broadcasted_iota(jnp.int32, (1, V.shape[0]), 1)
    e_xo = (rv == 0).astype(dtype)
    e_xn = (rv == 1).astype(dtype)
    e_go = (rv == 2).astype(dtype)
    e_gn = (rv == 3).astype(dtype)
    sv = mm(e_xn - e_xo, V)                        # (1, n_pad) step
    yv = mm(e_gn - e_go, V)                        # grad diff
    gn = mm(e_gn, V)                               # new gradient row

    # curvature gate: ls_ok & sy > 1e-10 |s||y| & sy > 0  — all (1, 1)
    sy = mm(sv, yv.T)
    s2 = mm(sv, sv.T)
    y2 = mm(yv, yv.T)
    good11 = (lsok11
              * (sy > 1e-10 * jnp.sqrt(s2 * y2)).astype(dtype)
              * (sy > 0).astype(dtype))            # (1, 1) 0/1
    goodb = good11 > 0

    # history write: row head <- sv, row m+head <- yv (iff good);
    # row 2m <- g_new (always). One-hot columns turn the dynamic-index
    # scatter into two (rows, 1) @ (1, n_pad) matmuls.
    ri = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col_s = (ri == head11).astype(dtype) * good11  # (rows, 1)
    col_y = (ri == head11 + m).astype(dtype) * good11
    col_g = (ri == 2 * m).astype(dtype)
    A_new = (A * (1.0 - col_s - col_y - col_g)
             + mm(col_s, sv) + mm(col_y, yv) + mm(col_g, gn))
    A_out[0] = A_new

    # int32-array modulus: python-int % under x64 makes an i64 constant
    # that Mosaic cannot convert (see _dir_math note)
    head_new = jnp.where(goodb, (head11 + 1) % jnp.asarray(m, jnp.int32),
                         head11)                             # (1,1) i32
    hlen_new = jnp.where(goodb, jnp.minimum(hlen11 + 1, m), hlen11)

    # termination / next-step scalars from g_new (padded tail is zero)
    pgn = jnp.max(jnp.abs(gn), axis=1, keepdims=True)        # (1, 1)
    gnorm1 = mm(jnp.abs(gn), jnp.ones((n_pad, 1), dtype))    # (1, 1)

    # next direction from the UPDATED history; non-descent fallback -g
    d = _dir_math(A_new, head_new, hlen_new, m, rows)
    desc = mm(d, gn.T)                                       # (1, 1)
    bad = (desc >= 0) | ~jnp.isfinite(desc)
    d_ref[0] = jnp.where(bad, -gn, d)

    c = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    s_ref[0] = ((c == 0).astype(dtype) * good11
                   + (c == 1).astype(dtype) * pgn
                   + (c == 2).astype(dtype) * gnorm1
                   + (c == 3).astype(dtype) * head_new.astype(dtype)
                   + (c == 4).astype(dtype) * hlen_new.astype(dtype)
                   + (c == 5).astype(dtype) * sy)


def _step_batched(m, Haug, V, sc):
    """Batched fused step: Haug (B, rows, n_pad) f32, V (B, 8, n_pad)
    f32, sc (B, 1, 3) int32 -> (A_new, d, s) with shapes
    (B, rows, n_pad), (B, 1, n_pad), (B, 1, 128)."""
    B, rows, n_pad = Haug.shape
    kern = functools.partial(_step_kernel, m, rows)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, n_pad), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, n_pad), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, n_pad), Haug.dtype),
            jax.ShapeDtypeStruct((B, 1, n_pad), Haug.dtype),
            jax.ShapeDtypeStruct((B, 1, 128), Haug.dtype),
        ],
        interpret=_INTERPRET[0],
        debug=bool(__import__("os").environ.get("DIR_PALLAS_DEBUG")),
    )(Haug, V, sc)


def _pack_v(x_old, x_new, g_old, g_new, n_pad):
    V = jnp.zeros((8, n_pad), x_old.dtype)
    V = V.at[0, : x_old.shape[0]].set(x_old)
    V = V.at[1, : x_old.shape[0]].set(x_new)
    V = V.at[2, : x_old.shape[0]].set(g_old)
    V = V.at[3, : x_old.shape[0]].set(g_new)
    return V


def fused_step(m, A, x_old, x_new, g_old, g_new, head, hlen, ls_ok):
    """Fused post-line-search step (single member or vmapped).

    A: (rows, n_pad) padded augmented history block (the PERSISTENT
    solver state in the fused path — rows [0, 2m) circular H pairs,
    row 2m the gradient of the current iterate). Returns
    (A_new, d_next, good, pgn, gnorm1, head_new, hlen_new)."""
    fn = _make_step_any(m)
    return fn(A, x_old, x_new, g_old, g_new, head, hlen, ls_ok)


@functools.lru_cache(maxsize=None)
def _make_step_any(m):
    @jax.custom_batching.custom_vmap
    def step_any(A, x_old, x_new, g_old, g_new, head, hlen, ls_ok):
        n_pad = A.shape[1]
        V = _pack_v(x_old, x_new, g_old, g_new, n_pad)
        sc = jnp.stack([head.astype(jnp.int32), hlen.astype(jnp.int32),
                        ls_ok.astype(jnp.int32)])
        A2, d, s = _step_batched(m, A[None], V[None], sc[None, None])
        return _unpack_step(A2[0], d[0], s[0], x_old.shape[0])

    @step_any.def_vmap
    def _step_any_vmap(axis_size, in_batched, A, x_old, x_new, g_old,
                       g_new, head, hlen, ls_ok):
        B = axis_size

        def bc(v, isb):
            return v if isb else jnp.broadcast_to(v[None], (B,) + v.shape)

        A = bc(A, in_batched[0])
        x_old = bc(x_old, in_batched[1])
        x_new = bc(x_new, in_batched[2])
        g_old = bc(g_old, in_batched[3])
        g_new = bc(g_new, in_batched[4])
        head = bc(head, in_batched[5])
        hlen = bc(hlen, in_batched[6])
        ls_ok = bc(ls_ok, in_batched[7])
        n_pad = A.shape[2]
        V = jax.vmap(lambda a, b_, c_, d_: _pack_v(a, b_, c_, d_, n_pad))(
            x_old, x_new, g_old, g_new)
        sc = jnp.stack([head.astype(jnp.int32), hlen.astype(jnp.int32),
                        ls_ok.astype(jnp.int32)], axis=-1)[:, None]
        A2, d, s = _step_batched(m, A, V, sc)
        out = jax.vmap(_unpack_step, in_axes=(0, 0, 0, None))(
            A2, d, s, x_old.shape[1])
        return out, jtu.tree_map(lambda _: True, out)

    return step_any


def _unpack_step(A_new, d, s, n):
    """A_new (rows, n_pad), d (1, n_pad), s (1, 128) per member."""
    return (A_new, d[0, :n], s[0, 0] > 0.5, s[0, 1], s[0, 2],
            s[0, 3].astype(jnp.int32), s[0, 4].astype(jnp.int32))


def pallas_step_supported(leaves, m, dtype):
    """Predicate: the fused-step path applies (same regime as the fused
    direction kernel — flat f32 vector on TPU, 2m+1 rows in one tile)."""
    return pallas_dir_supported(leaves, m, dtype)


def _dir_batched(m, Haug, hh):
    """Batched fused direction: Haug (B, rows, n_pad) f32 augmented
    history, hh (B, 1, 2) int32 [head, hlen] -> d (B, 1, n_pad)."""
    B, rows, n_pad = Haug.shape
    kern = functools.partial(_dir_kernel, m, rows)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, n_pad), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda b: (b, b * 0, b * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n_pad), Haug.dtype),
        interpret=_INTERPRET[0],
    )(Haug, hh)


def _pack(g, H, head, hlen, m):
    """(n,) g + (2m, n) H -> (1, rows, n_pad) augmented block +
    (1, 1, 2) int32 scalars (3-D: see _dir_kernel note). rows = 16
    keeps the sublane dim one f32 tile."""
    n = g.shape[0]
    n_pad = -(-n // 128) * 128
    rows = 16 if 2 * m + 1 <= 16 else (-(-(2 * m + 1) // 8) * 8)
    A = jnp.zeros((rows, n_pad), g.dtype)
    A = A.at[: 2 * m, :n].set(H)
    A = A.at[2 * m, :n].set(g)
    hh = jnp.stack([head.astype(jnp.int32),
                    hlen.astype(jnp.int32)])
    return A[None], hh[None, None]


@functools.partial(jax.custom_batching.custom_vmap)
def _dir_any(g, H, head, hlen):
    m = H.shape[0] // 2
    A, hh = _pack(g, H, head, hlen, m)
    d = _dir_batched(m, A, hh)
    return d[0, 0, : g.shape[0]]


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
    return d[:, 0, : g.shape[1]], True


def compact_dir_pallas(g, H, head, hlen):
    """Fused-Pallas L-BFGS direction for a FLAT f32 decision vector.

    Drop-in for ``_compact_dir(g, H, rho, head, hlen, m, dtype)`` with
    rho unused; vmap dispatches every member to one Pallas grid step.
    """
    return _dir_any(g, H, head, hlen)


def pallas_dir_supported(leaves, m, dtype):
    """Predicate: the fused direction kernel applies (flat f32 vector on
    an accelerator backend, augmented rows fit one sublane tile, and the
    per-program VMEM working set fits). The step kernel's window set is
    ~41 rows x n_pad x 4 B x 2 buffering levels (A in/out, V, d), so
    n_pad beyond ~32k overflows the 16 MB VMEM (measured OOM at the
    D=400 sweep, n_dof=64401) — large problems keep the XLA compact
    direction, which is the right trade there anyway (launch overhead
    amortizes over big kernels)."""
    if len(leaves) != 1 or leaves[0].ndim != 1:
        return False
    if dtype != jnp.float32:
        return False
    if 2 * m + 1 > 16:
        return False
    if leaves[0].shape[-1] > 32 * 1024:
        return False
    if _INTERPRET[0]:      # test mode: interpreter runs anywhere
        return True
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:  # pragma: no cover
        return False
