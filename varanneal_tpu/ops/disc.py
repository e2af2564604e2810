"""Discretization residual assemblers.

Each returns the model-error residual rows of the action for one
discretization (reference: ``varanneal/va_ode.py :: Annealer.disc_trapezoid /
disc_SimpsonHermite / disc_euler / disc_forwardmap`` [M, SURVEY.md §2]).
All are pure, branch-free in data, expressed as slices over the time axis so
the assembly stays blockwise (halo = 1–2 steps) and can be sharded across the
time axis later (SURVEY.md §5 "long-context analog").

Residual conventions [pinned-by-oracle]:

    euler:          g_n = x_{n+1} - x_n - h * f(t_n, x_n)
    trapezoid:      g_n = x_{n+1} - x_n - (h/2) * (f_n + f_{n+1})
    forwardmap:     g_n = x_{n+1} - f(t_n, x_n)          (discrete-time maps)
    SimpsonHermite: on the doubled grid with full interval h over [n, n+2]:
        simpson_n = x_{n+2} - x_n - (h/6) * (f_n + 4 f_{n+1} + f_{n+2})
        hermite_n = x_{n+1} - (x_n + x_{n+2})/2 - (h/8) * (f_n - f_{n+2})

Residuals are in state units (no 1/h^2 factor — SURVEY.md checklist item
"FE residual units").
"""

from varanneal_tpu.ops.spec import ProblemSpec


def _f_at(spec: ProblemSpec, X, P, sl):
    """Evaluate the vector field on a time-slice ``sl`` of the model grid.

    Handles time-dependent parameters (rows of P aligned with the grid) and
    the stimulus convention f(t, x, (p, stim)).
    """
    import jax.numpy as jnp
    x = X[sl]
    # cast grid/stimulus closure constants to the state dtype so an f32
    # decision path stays f32 even when x64 is enabled globally
    t = jnp.asarray(spec.t_f, x.dtype)[sl]
    p = P[sl] if spec.time_dep_p else P
    if spec.stim_f is not None:
        return spec.f(t, x, (p, jnp.asarray(spec.stim_f, x.dtype)[sl]))
    return spec.f(t, x, p)


def model_residuals(spec: ProblemSpec, X, P):
    """Residual rows for the model-error term.

    Returns (N_f-1, D) for euler/trapezoid/forwardmap, or a tuple
    ``(simpson, hermite)`` of two ((N_f-1)//2, D) arrays for SimpsonHermite.
    """
    h = spec.dt
    if spec.disc == "trapezoid":
        fn = _f_at(spec, X, P, slice(None, -1))
        fnp1 = _f_at(spec, X, P, slice(1, None))
        return X[1:] - X[:-1] - (h / 2.0) * (fn + fnp1)
    if spec.disc == "euler":
        fn = _f_at(spec, X, P, slice(None, -1))
        return X[1:] - X[:-1] - h * fn
    if spec.disc == "forwardmap":
        fn = _f_at(spec, X, P, slice(None, -1))
        return X[1:] - fn
    if spec.disc == "SimpsonHermite":
        fn = _f_at(spec, X, P, slice(None, -2, 2))
        fmid = _f_at(spec, X, P, slice(1, -1, 2))
        fnp1 = _f_at(spec, X, P, slice(2, None, 2))
        xe, xm, xo = X[:-2:2], X[1:-1:2], X[2::2]
        simpson = xo - xe - (h / 6.0) * (fn + 4.0 * fmid + fnp1)
        hermite = xm - 0.5 * (xe + xo) - (h / 8.0) * (fn - fnp1)
        return simpson, hermite
    raise ValueError(f"unknown disc {spec.disc!r}")
