"""Mesh / ensemble parallelism."""

from varanneal_tpu.parallel.ensemble import (
    make_ensemble_ladder, ensemble_mesh, shard_batch, random_ensemble_inits,
)

__all__ = ["make_ensemble_ladder", "ensemble_mesh", "shard_batch",
           "random_ensemble_inits"]
