"""Time-axis sharding — the sequence-parallel analog.

A single VA problem's decision variables are the (N_f, D) state-time plane.
The FE term couples only adjacent grid points (trapezoid/euler: 1 step;
Hermite–Simpson: 2 steps — SURVEY.md §5 "banded, stencil-like structure"),
so the time axis shards across devices with only halo exchange.

TPU-native mechanism: we do NOT hand-write the halos. The structured action
(``make_action_tree``) expresses the stencil as static slices of the (N_f, D)
array; sharding that array over a mesh ``time`` axis lets GSPMD partition the
computation and insert the 1–2-row collective-permutes itself — the
scaling-book recipe (pick a mesh, annotate shardings, let XLA insert
collectives). The L-BFGS history pytrees inherit the same layout through
sharding propagation, so optimizer state never gathers.

Because NamedSharding needs the sharded dimension divisible by the axis size
(and Hermite–Simpson grids are always odd), the grid is padded with
zero-FE-weight rows whose weights are rescaled so the padded action equals
the original EXACTLY (see ``ops.spec.pad_spec_time``); padded states have
zero gradient and never move.

Composes with ensemble data-parallelism: a 2-D ('ens', 'time') mesh shards
the member batch on one axis and each member's time plane on the other.
"""

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from varanneal_tpu.ops.spec import (
    ProblemSpec, canonical_R, pad_spec_time, pad_rf0, pad_decision_tree)
from varanneal_tpu.ops.action import make_action_tree, tree_of_flat
from varanneal_tpu.opt.lbfgs import LBFGSOptions
from varanneal_tpu.anneal.ladder import run_ladder


def time_mesh(n_time: int, n_ens: int = 1):
    """Build an ('ens', 'time') mesh over the first n_ens*n_time devices
    (1-D time-only mesh when n_ens == 1)."""
    devs = np.asarray(jax.devices()[: n_ens * n_time])
    return Mesh(devs.reshape(n_ens, n_time), ("ens", "time"))


@dataclasses.dataclass(frozen=True)
class TimeShardedProblem:
    """A time-shardable ladder bound to a mesh; see make_timesharded_ladder.
    ``run(tree0)`` expects a decision tree prepared by ``prepare``."""
    spec: ProblemSpec           # original (unpadded) spec
    spec_pad: ProblemSpec
    mesh: Mesh
    batched: bool
    run: Callable               # jitted ladder fn
    prepare_fn: Callable

    def prepare(self, init):
        """Flat (n_dof,)/(B, n_dof) or structured tree -> padded, sharded
        decision tree."""
        return self.prepare_fn(init)

    def unpad_X(self, X):
        """Strip sharding-pad rows from a (..., N_pad, D) state array."""
        return np.asarray(X)[..., : self.spec.N_f, :]


def make_timesharded_ladder(spec: ProblemSpec, betas, rf0, alpha, *,
                            mesh: Mesh,
                            opts: Optional[LBFGSOptions] = None,
                            store_paths: bool = False,
                            batched: bool = False) -> TimeShardedProblem:
    """Build a jitted annealing ladder whose state-time plane is sharded
    over the mesh 'time' axis (and the member batch over 'ens' when
    ``batched``). RF0: scalar or canonical array for the ORIGINAL grid.
    """
    opts = opts or LBFGSOptions()
    n_time = mesh.shape["time"]
    spec_pad, row_scale = pad_spec_time(spec, n_time)
    rf0_c = canonical_R(rf0, spec.N_f - 1, spec.D, "RF0")
    rf0_pad = (pad_rf0(spec, spec_pad, rf0_c, row_scale)
               if spec_pad.N_f != spec.N_f else rf0_c)

    action, parts = make_action_tree(spec_pad)
    betas = jnp.asarray(betas)

    def one(tree0):
        return run_ladder(action, parts, tree0, betas, rf0_pad, alpha,
                          opts=opts, store_paths=store_paths)

    fn = jax.jit(jax.vmap(one) if batched else one)

    lead = ("ens",) if batched else ()
    x_shard = NamedSharding(mesh, P(*lead, "time", None))
    p_shard = NamedSharding(mesh, P(*lead))

    def prepare(init):
        init = jax.tree_util.tree_map(jnp.asarray, init)
        if not isinstance(init, dict):
            init = tree_of_flat(spec, init)
        tree = pad_decision_tree(spec, spec_pad, init)
        return {
            "X": jax.device_put(tree["X"], x_shard),
            "pest": jax.device_put(tree["pest"], p_shard),
        }

    return TimeShardedProblem(spec=spec, spec_pad=spec_pad, mesh=mesh,
                              batched=batched, run=fn, prepare_fn=prepare)
