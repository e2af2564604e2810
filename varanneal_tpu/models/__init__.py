"""Built-in vector fields f(t, x, p) for VA problems.

Model-call convention (matches the reference's vectorized-callable contract,
``varanneal/va_ode.py :: Annealer.set_model`` [M, SURVEY.md §2]):

- ``f(t, x, p)`` where ``t`` has shape ``(...,)``, ``x`` has shape
  ``(..., D)`` and ``p`` is either a 1-D parameter vector ``(NP,)`` or a
  time-dependent array broadcastable to ``(..., NP)``.
- Driven systems are called as ``f(t, x, (p, stim))`` where ``stim`` has
  shape ``(..., S)`` — the reference's stimulus convention.
- ``f`` must be pure jnp code with no data-dependent Python branching (the
  same restriction the reference imposes for ADOL-C taping; here it is what
  makes the model jit/vmap/grad-safe).
"""

from varanneal_tpu.models.lorenz import lorenz96, lorenz63
from varanneal_tpu.models.nakl import (
    nakl, nakl_param_boxes, nakl_log_model, nakl_ss_gates,
    nakl_ensemble_inits, NAKL_P_TRUE, NAKL_PNAMES, NAKL_PBOUNDS,
    NAKL_STATE_BOUNDS, NAKL_TAU_IDX, NAKL_G_IDX)
from varanneal_tpu.models.colpitts import (
    colpitts, COLPITTS_P_TRUE, COLPITTS_PNAMES)

__all__ = ["lorenz96", "lorenz63", "nakl", "nakl_param_boxes",
           "nakl_log_model", "nakl_ss_gates", "nakl_ensemble_inits",
           "NAKL_P_TRUE", "NAKL_PNAMES", "NAKL_PBOUNDS",
           "NAKL_STATE_BOUNDS", "NAKL_TAU_IDX", "NAKL_G_IDX",
           "colpitts", "COLPITTS_P_TRUE", "COLPITTS_PNAMES"]
