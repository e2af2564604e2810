"""The Gaussian VA action: measurement error + annealed model error.

This module is ~90% of the numerical contract with the reference
(``varanneal/va_ode.py :: Annealer.A_gaussian / me_gaussian / fe_gaussian``
[M/H, SURVEY.md §3.2]); every normalization here is pinned by the independent
NumPy oracle in ``tests/oracle.py``:

    A(XP, rf) = ME(X) + FE(X, P; rf)
    ME = (1 / (L * N_data))    * sum_n sum_{l in Lidx} RM ⊙ (x_l(t_n) - y_l(t_n))^2
    FE = (1 / (D * (N_f - 1))) * sum over residual rows of rf ⊙ g^2

with RM in {scalar, (N_data, L), (N_data, L, L)} and rf in
{scalar, (N_f-1, D), (N_f-1, D, D)}. For Hermite–Simpson, even rf rows
(rf[::2]) weight the Simpson residuals and odd rows (rf[1::2]) the Hermite
residuals, matching the reference's interleaved convention [M].

Only ``XP`` (flat decision vector) and ``rf`` (annealed precision) are traced
arguments — the whole β ladder shares one XLA compilation.
"""

import jax.numpy as jnp
import numpy as np

from varanneal_tpu.ops.spec import ProblemSpec
from varanneal_tpu.ops.disc import model_residuals


def pack(spec: ProblemSpec, X, P=None):
    """Flatten (X, estimated-parameter values) into the decision vector XP.

    Packing order [pinned-by-oracle, SURVEY.md §2 'Decision-variable
    packing']: row-major X.flatten() then the estimated parameters (row-major
    (N_f, NPest) in the time-dependent case).
    """
    parts = [jnp.reshape(X, (-1,))]
    if spec.NPest:
        P = spec.P_base if P is None else P
        P = jnp.asarray(P)
        pcols = np.asarray(spec.pidx, dtype=np.int32)
        if spec.time_dep_p:
            parts.append(jnp.reshape(P[:, pcols], (-1,)))
        else:
            parts.append(jnp.reshape(P[pcols], (-1,)))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def merge_params(spec: ProblemSpec, pest, dtype):
    """Merge estimated parameter values into the fixed base values.

    ``pest``: (NPest,) or (N_f, NPest) (time-dependent). Returns the full
    (NP,) or (N_f, NP) parameter array."""
    P = jnp.asarray(spec.P_base, dtype=dtype)
    if spec.NPest:
        pcols = np.asarray(spec.pidx, dtype=np.int32)
        if spec.time_dep_p:
            P = P.at[:, pcols].set(jnp.reshape(pest,
                                               (spec.N_f, spec.NPest)))
        else:
            P = P.at[pcols].set(jnp.reshape(pest, (spec.NPest,)))
    return P


def unpack(spec: ProblemSpec, XP):
    """Split flat XP into X (N_f, D) and the full parameter array (estimated
    entries merged into the fixed base values)."""
    X = jnp.reshape(XP[: spec.n_state], (spec.N_f, spec.D))
    P = merge_params(spec, XP[spec.n_state:], XP.dtype)
    return X, P


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (s = fl(a+b), e = the
    round-off), elementwise."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def comp_sum(x):
    """Compensated (two-float) sum of all elements of ``x``: a vectorized
    binary-tree reduction where every pairwise add carries its exact
    round-off in a parallel ``lo`` stream. All VECTOR math stays in the
    input dtype (TPU-safe: no emulated-f64 vector ops, no f64 compile
    path); only the final SCALAR (hi, lo) pair is combined in f64 when
    x64 is enabled, so an f32 action value keeps ~f64 effective accuracy
    of the sum instead of being re-rounded to one f32 ulp — that final
    rounding is what makes plain-f32 action DIFFERENCES unresolvable in
    the high-rf line searches (PARITY.md dtype study; VERDICT r02
    next-round #3b). log2(N) vectorized steps, ~4 flops/element."""
    import jax as _jax
    x = jnp.ravel(x)
    hi = x
    lo = jnp.zeros_like(x)
    while hi.shape[0] > 1:
        n = hi.shape[0]
        if n % 2:
            hi = jnp.concatenate([hi, jnp.zeros((1,), hi.dtype)])
            lo = jnp.concatenate([lo, jnp.zeros((1,), lo.dtype)])
            n += 1
        h1, h2 = hi[: n // 2], hi[n // 2:]
        l1, l2 = lo[: n // 2], lo[n // 2:]
        hi, e = _two_sum(h1, h2)
        lo = l1 + l2 + e
    if x.dtype == jnp.float32 and _jax.config.jax_enable_x64:
        return (hi[0].astype(jnp.float64) + lo[0].astype(jnp.float64))
    return hi[0] + lo[0]


def _quad(R, d, compensated=False):
    """Quadratic contraction sum of R against residual rows d (N, K).

    R: scalar -> R * sum(d^2); (N, K) -> sum(R * d^2);
    (N, K, K) -> sum_n d_n . R_n . d_n. ``compensated``: accumulate with
    :func:`comp_sum` (two-float exact-sum tree) instead of a plain sum.
    """
    R = jnp.asarray(R, dtype=d.dtype)
    _sum = comp_sum if compensated else jnp.sum
    if R.ndim == 0:
        return R * _sum(d * d)
    if R.ndim == 2:
        return _sum(R * d * d)
    if compensated:
        return comp_sum(jnp.einsum("nk,nkl->nl", d, R) * d)
    return jnp.einsum("nk,nkl,nl->", d, R, d)


def measurement_error(spec: ProblemSpec, X, compensated=False):
    """ME = (1/(L*N_data)) * quad(RM, x_obs - Y). The [:N_data] slice is a
    no-op on exact grids and drops trailing rows on sharding-padded grids
    (see spec.pad_spec_time)."""
    x_obs = X[:: spec.obs_stride][: spec.N_data,
                                  np.asarray(spec.Lidx, dtype=np.int32)]
    diff = x_obs - jnp.asarray(spec.Y, dtype=X.dtype)
    return _quad(spec.RM, diff, compensated) / (spec.L * spec.N_data)


def model_error(spec: ProblemSpec, X, P, rf, compensated=False):
    """FE = (1/(D*(N_f-1))) * quad(rf, residual rows)."""
    res = model_residuals(spec, X, P)
    _sum = comp_sum if compensated else jnp.sum
    if spec.disc == "SimpsonHermite":
        simpson, hermite = res
        rf = jnp.asarray(rf, dtype=X.dtype)
        if rf.ndim == 0:
            ferr = rf * (_sum(simpson * simpson)
                         + _sum(hermite * hermite))
        else:
            # pair rf rows explicitly with the residual count: on
            # sharding-padded (even-N_f) grids rf has one dangling
            # zero-weight row beyond the last interval
            M = (spec.N_f - 1) // 2
            ferr = (_quad(rf[: 2 * M: 2], simpson, compensated)
                    + _quad(rf[1: 2 * M: 2], hermite, compensated))
    else:
        ferr = _quad(rf, res, compensated)
    return ferr / (spec.D * (spec.N_f - 1))


def make_action(spec: ProblemSpec, compensated: bool = False):
    """Build the pure action functions on the FLAT decision vector.

    Returns ``(action, action_parts)`` with signatures
    ``action(XP, rf) -> A`` and ``action_parts(XP, rf) -> (A, ME, FE)``.
    ``compensated=True`` accumulates the ME/FE quadratic sums with the
    two-float exact-sum tree (:func:`comp_sum`) — same asymptotic cost,
    removes the sqrt(N)-growth reduction noise that erodes the f32
    action floor at high rf (PARITY.md dtype study).
    """
    def action_parts(XP, rf):
        X, P = unpack(spec, XP)
        me = measurement_error(spec, X, compensated)
        fe = model_error(spec, X, P, rf, compensated)
        return me + fe, me, fe

    def action(XP, rf):
        return action_parts(XP, rf)[0]

    return action, action_parts


def make_action_tree(spec: ProblemSpec):
    """Build the action on the STRUCTURED decision pytree
    ``{"X": (N_f, D), "pest": (NPest,) | (N_f, NPest)}``.

    This is the sharding-friendly frontend: keeping X two-dimensional lets a
    mesh 'time' axis shard N_f directly, with GSPMD inserting the 1–2-step
    halo collectives the stencil needs (SURVEY.md §5 sequence-parallel
    analog) — no flat-vector resharding.
    """
    def action_parts(tree, rf):
        X = tree["X"]
        P = merge_params(spec, tree["pest"], X.dtype)
        me = measurement_error(spec, X)
        fe = model_error(spec, X, P, rf)
        return me + fe, me, fe

    def action(tree, rf):
        return action_parts(tree, rf)[0]

    return action, action_parts


def tree_of_flat(spec: ProblemSpec, XP):
    """Flat decision vector -> structured tree."""
    XP = jnp.asarray(XP)
    pest = XP[..., spec.n_state:]
    if spec.time_dep_p and spec.NPest:
        pest = pest.reshape(XP.shape[:-1] + (spec.N_f, spec.NPest))
    return {
        "X": XP[..., : spec.n_state].reshape(
            XP.shape[:-1] + (spec.N_f, spec.D)),
        "pest": pest,
    }


def flat_of_tree(spec: ProblemSpec, tree):
    """Structured tree -> flat decision vector."""
    X = tree["X"]
    lead = X.shape[:-2]
    return jnp.concatenate(
        [X.reshape(lead + (spec.n_state,)),
         jnp.reshape(tree["pest"], lead + (-1,))], axis=-1)
