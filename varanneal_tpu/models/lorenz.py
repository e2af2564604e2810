"""Lorenz-63 and Lorenz-96 vector fields.

Lorenz-96 is the canonical VA twin-experiment model (reference bundled CPU
example: D=20, L=8 observed, trapezoidal, N=161 — BASELINE.json config #1).

Models may optionally carry a ``.transposed`` attribute: a variant
evaluated on the TRANSPOSED padded layout ``xT (D_pad, N)`` (components
on sublanes, time on lanes) used by the small-D fused action+grad Pallas
kernel (kernels/ag_pallas.py) — at D << 128 the row-major layout wastes
the vector lanes, the transposed one fills them. Contract: rows >= D of
``xT`` are padding; the variant must produce D valid output rows (pad
rows may hold garbage — the kernel masks them) and must not mix pad rows
into valid ones (periodic shifts are D-periodic one-hot matmuls at
HIGHEST precision, never jnp.roll over D_pad).
"""

import numpy as np

import jax.numpy as jnp
from jax import lax


def _rollmat(D, D_pad, k, dtype):
    """(D_pad, D_pad) one-hot matrix: (R @ xT)[i] = xT[(i + k) % D] for
    i < D, zero rows above — the D-periodic sublane shift as an exact
    matmul. Built from iota (Pallas kernels cannot capture array
    constants); the modulus is an int32 ARRAY (a python-int % operand
    under x64 makes an i64 constant Mosaic cannot lower — measured,
    kernels/dir_pallas.py)."""
    from jax import lax as _lax
    ri = _lax.broadcasted_iota(jnp.int32, (D_pad, D_pad), 0)
    ci = _lax.broadcasted_iota(jnp.int32, (D_pad, D_pad), 1)
    tgt = (ri + jnp.asarray(k % D, jnp.int32)) % jnp.asarray(D, jnp.int32)
    return ((ci == tgt) & (ri < D)).astype(dtype)


def _pcol(p, j):
    """Extract parameter column j from p of shape (NP,) or (..., NP),
    broadcastable against x of shape (..., D)."""
    p = jnp.asarray(p)
    if p.ndim == 0:
        return p
    if p.ndim == 1:
        return p[j]
    return p[..., j:j + 1]  # (..., 1) broadcasts over D


def lorenz96(t, x, p):
    """Lorenz-96: dx_i/dt = (x_{i+1} - x_{i-2}) x_{i-1} - x_i + F.

    p = [F] (one parameter). Written with rolls along the state axis so it is
    vectorized over an arbitrary leading time/batch shape — the same idiom
    the reference uses with np.roll (SURVEY.md §2 "vectorized over the whole
    time axis").
    """
    xp1 = jnp.roll(x, -1, axis=-1)
    xm2 = jnp.roll(x, 2, axis=-1)
    xm1 = jnp.roll(x, 1, axis=-1)
    return (xp1 - xm2) * xm1 - x + _pcol(p, 0)


def _lorenz96_T(D):
    """Transposed Lorenz-96 (see module docstring): elementwise over the
    full (D_pad, N) block — ~D/D_pad lane+sublane utilization vs D/128
    for the row-major layout at small D."""
    def fT(t, xT, p):
        dtype = xT.dtype
        D_pad = xT.shape[0]
        mm = lambda A, B: jnp.dot(A, B, preferred_element_type=dtype,
                                  precision=lax.Precision.HIGHEST)
        xp1 = mm(_rollmat(D, D_pad, 1, dtype), xT)
        xm2 = mm(_rollmat(D, D_pad, -2, dtype), xT)
        xm1 = mm(_rollmat(D, D_pad, -1, dtype), xT)
        return (xp1 - xm2) * xm1 - xT + _pcol(p, 0)
    return fT


lorenz96.transposed = _lorenz96_T


def lorenz63(t, x, p):
    """Lorenz-63: p = [sigma, rho, beta]."""
    sigma, rho, beta = _pcol(p, 0), _pcol(p, 1), _pcol(p, 2)
    x0, x1, x2 = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    dx0 = sigma * (x1 - x0)
    dx1 = x0 * (rho - x2) - x1
    dx2 = x0 * x1 - beta * x2
    return jnp.concatenate([dx0, dx1, dx2], axis=-1)
