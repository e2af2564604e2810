"""Lorenz-63 and Lorenz-96 vector fields.

Lorenz-96 is the canonical VA twin-experiment model (reference bundled CPU
example: D=20, L=8 observed, trapezoidal, N=161 — BASELINE.json config #1).
"""

import jax.numpy as jnp


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


def lorenz63(t, x, p):
    """Lorenz-63: p = [sigma, rho, beta]."""
    sigma, rho, beta = _pcol(p, 0), _pcol(p, 1), _pcol(p, 2)
    x0, x1, x2 = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    dx0 = sigma * (x1 - x0)
    dx1 = x0 * (rho - x2) - x1
    dx2 = x0 * x1 - beta * x2
    return jnp.concatenate([dx0, dx1, dx2], axis=-1)
