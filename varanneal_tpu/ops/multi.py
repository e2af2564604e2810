"""Multi-experiment (multi-protocol) variational annealing.

K twin experiments of the SAME model under DIFFERENT stimulus protocols /
observations are annealed jointly, sharing ONE estimated-parameter vector;
each experiment keeps its own state path. This is the literature's standard
identifiability lever for stiff neuron-model inversion (multi-protocol
current injection à la Kostuk/Toth: parameter combinations that are flat
under one drive are pinned by another) — the reference library has no such
mode (SURVEY.md §2: one data window per Annealer), so this is a TPU-native
extension, not a parity item.

Pinned decisions:

- packing: ``XP = concat(X_1.flat, ..., X_K.flat, pest)`` — per-experiment
  states in experiment order, shared parameters last (extends the
  reference's states-then-params order, ops/action.py :: pack);
- the joint action is the MEAN of the per-experiment actions, so action
  values (and the annealing action-level diagnostic) stay on the same
  scale as a single experiment regardless of K;
- all specs must agree on (N_f, D, disc, NPest, pidx, P_base) and must not
  use time-dependent parameters; they may differ in Y, RM, stimulus, and
  observed indices Lidx.

The joint action works with every inner solver and the full ladder /
checkpoint machinery (it is just another ``action(XP, rf)`` on a flat
decision vector); one shared ``rf`` (scalar or canonical (N_f-1, D))
applies to every experiment.
"""

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from varanneal_tpu.ops.spec import ProblemSpec
from varanneal_tpu.ops.action import (measurement_error, model_error,
                                      merge_params, pack)


def _check_specs(specs: Sequence[ProblemSpec]):
    if not specs:
        raise ValueError("need at least one spec")
    s0 = specs[0]
    if s0.time_dep_p:
        raise ValueError("multi-experiment with time-dependent parameters "
                         "is not supported")
    for s in specs[1:]:
        if (s.N_f, s.D, s.disc) != (s0.N_f, s0.D, s0.disc):
            raise ValueError(
                "all experiments must share (N_f, D, disc): "
                f"{(s.N_f, s.D, s.disc)} != {(s0.N_f, s0.D, s0.disc)}")
        if s.pidx != s0.pidx or s.time_dep_p:
            raise ValueError("all experiments must share pidx")
        if not np.array_equal(np.asarray(s.P_base), np.asarray(s0.P_base)):
            raise ValueError("all experiments must share P_base")
    return s0


def make_multi_action(specs: Sequence[ProblemSpec]):
    """Joint action over K experiments with shared parameters.

    Returns ``(action, action_parts)`` on the flat decision vector
    ``concat(X_1.flat, ..., X_K.flat, pest)``; parts are the K-means of
    the per-experiment (A, ME, FE).
    """
    s0 = _check_specs(specs)
    K = len(specs)
    n_state = s0.n_state

    def action_parts(XP, rf):
        pest = XP[K * n_state:]
        me_sum = 0.0
        fe_sum = 0.0
        for k, s in enumerate(specs):
            X = jnp.reshape(XP[k * n_state: (k + 1) * n_state],
                            (s.N_f, s.D))
            P = merge_params(s, pest, XP.dtype)
            me_sum = me_sum + measurement_error(s, X)
            fe_sum = fe_sum + model_error(s, X, P, rf)
        me = me_sum / K
        fe = fe_sum / K
        return me + fe, me, fe

    def action(XP, rf):
        return action_parts(XP, rf)[0]

    return action, action_parts


def multi_pack(specs: Sequence[ProblemSpec], Xs: Sequence, P=None):
    """Flatten per-experiment states + one shared parameter set into the
    joint decision vector (shared pest taken from ``P``/spec P_base via
    the single-experiment packing rule)."""
    s0 = _check_specs(specs)
    if len(Xs) != len(specs):
        raise ValueError(f"need {len(specs)} state paths, got {len(Xs)}")
    flats = [jnp.reshape(jnp.asarray(X), (-1,)) for X in Xs]
    tail = pack(s0, jnp.zeros((s0.N_f, s0.D)), P=P)[s0.n_state:]
    return jnp.concatenate(flats + [tail])


def multi_unpack(specs: Sequence[ProblemSpec], XP):
    """Joint decision vector -> ([X_1, ..., X_K], pest)."""
    s0 = _check_specs(specs)
    n = s0.n_state
    K = len(specs)
    Xs = [jnp.reshape(XP[k * n: (k + 1) * n], (s0.N_f, s0.D))
          for k in range(K)]
    return Xs, XP[K * n:]


def build_multi_bounds(specs: Sequence[ProblemSpec], bounds, dtype):
    """Per-variable bounds replicated over time AND experiments.

    ``bounds``: D (lo, hi) state pairs + NPest parameter pairs, exactly as
    :func:`varanneal_tpu.api.build_bounds`; states repeat once per
    experiment, parameters once at the tail."""
    from varanneal_tpu.api import build_bounds
    s0 = _check_specs(specs)
    lower1, upper1 = build_bounds(s0, bounds, dtype)
    if lower1 is None:
        return None, None
    K = len(specs)
    n = s0.n_state
    lower = np.concatenate([np.tile(lower1[:n], K), lower1[n:]])
    upper = np.concatenate([np.tile(upper1[:n], K), upper1[n:]])
    return lower, upper
