"""Colpitts oscillator vector field.

The chaotic Colpitts circuit is the third standard twin-experiment model of
the VA literature (alongside Lorenz-96 and NaKL): a 3-state nonlinear
oscillator with one exponential nonlinearity, used in Quinn's UCSD
dissertation and the group's PRE papers as a parameter-estimation testbed
(SURVEY.md §4 "literature as oracle"; the reference ships no model zoo —
users pass ``f`` — so this is a convenience with the same call convention,
``varanneal/va_ode.py :: Annealer.set_model`` [M]).

Dimensionless form (Kennedy's normalization):

    dx1/dt = alpha * x2
    dx2/dt = -gamma * (x1 + x3) - q * x2
    dx3/dt = eta * (x2 + 1 - exp(-x1))

Chaotic at the standard operating point ``COLPITTS_P_TRUE``.
"""

import jax.numpy as jnp

from varanneal_tpu.models.lorenz import _pcol

COLPITTS_PNAMES = ["alpha", "gamma", "q", "eta"]
COLPITTS_P_TRUE = [5.0, 0.0797, 0.6898, 6.2723]


def colpitts(t, x, p):
    """Colpitts oscillator; p = [alpha, gamma, q, eta]. Vectorized over an
    arbitrary leading time/batch shape like every built-in model."""
    alpha, gamma = _pcol(p, 0), _pcol(p, 1)
    q, eta = _pcol(p, 2), _pcol(p, 3)
    x1, x2, x3 = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    dx1 = alpha * x2
    dx2 = -gamma * (x1 + x3) - q * x2
    dx3 = eta * (x2 + 1.0 - jnp.exp(-x1))
    return jnp.concatenate([dx1, dx2, dx3], axis=-1)
