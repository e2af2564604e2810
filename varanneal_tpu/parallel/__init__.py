"""Mesh / ensemble parallelism."""

from varanneal_tpu.parallel.ensemble import (
    make_ensemble_ladder, ensemble_mesh, shard_batch, random_ensemble_inits,
    draw_anchored_problem, strip_anchors,
)
from varanneal_tpu.parallel.timeshard import (
    time_mesh, make_timesharded_ladder, TimeShardedProblem,
)

__all__ = ["make_ensemble_ladder", "ensemble_mesh", "shard_batch",
           "random_ensemble_inits", "draw_anchored_problem",
           "strip_anchors", "time_mesh", "make_timesharded_ladder",
           "TimeShardedProblem"]
