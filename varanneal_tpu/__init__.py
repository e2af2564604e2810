"""varanneal_tpu — TPU-native variational annealing.

A from-scratch JAX/XLA implementation of variational annealing (VA) for state
and parameter estimation in partially observed nonlinear dynamical systems,
with the capabilities of the reference library ``paulrozdeba/varanneal``
(see SURVEY.md at the repo root for the structural analysis of the reference;
reference anchors cited below use ``file :: symbol`` notation because the
reference mount was empty at build time — every numeric convention is instead
pinned by the independent NumPy/SciPy oracle in ``tests/oracle.py``).

Architecture (TPU-first, not a port):

- the Gaussian measurement+model-error action is a pure jittable function
  (``ops/action.py``), assembled blockwise so the time axis can later be
  sharded across devices (the sequence-parallel analog);
- exact gradients come from ``jax.grad`` — one XLA compilation replaces the
  reference's per-β ADOL-C re-taping (reference: ``varanneal/_autodiffmin.py
  :: ADmin.tape_A``);
- a bounded L-BFGS inner solver runs device-side under ``lax.while_loop``
  (``opt/lbfgs.py``), replacing SciPy's Fortran L-BFGS-B;
- the RF = RF0·α^β precision-annealing ladder runs under ``lax.scan`` with
  warm-started paths across β steps (``anneal/ladder.py``; reference:
  ``varanneal/va_ode.py :: Annealer.anneal_step``);
- ensembles of initial conditions ``vmap`` within a chip and shard across a
  TPU mesh (``parallel/ensemble.py``) so an entire annealing sweep never
  leaves HBM;
- ``api.Annealer`` is a facade matching the reference's public surface
  (``set_model`` / ``set_data`` / ``anneal`` / ``save_*``).
"""

__version__ = "0.1.0"

from varanneal_tpu import models, ops, opt, anneal, io  # noqa: F401
from varanneal_tpu import va_ode, va_nnet  # noqa: F401  (reference aliases)
from varanneal_tpu import workflow  # noqa: F401  (staged estimation)
from varanneal_tpu.api import Annealer  # noqa: F401
