"""Ensemble parallelism: vmap within a chip, shard across a TPU mesh.

The reference's entire concurrency story is user-managed multiprocessing over
ensemble members, namespaced by ADOL-C tape ids (``adolcID`` [M, SURVEY.md
§2 "Parallelism strategies"]). Here the ensemble dimension is a first-class
data-parallel axis:

- ``vmap`` batches whole annealing ladders over initial conditions — one
  compiled program, every member's while_loop masked independently;
- a ``jax.sharding.Mesh`` with a named ``ens`` axis shards the batch across
  devices via NamedSharding + jit — embarrassingly parallel, so the only ICI
  traffic is result gathers (BASELINE target: ≥1000 inits on a v5p-8).
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from varanneal_tpu.opt.lbfgs import LBFGSOptions
from varanneal_tpu.anneal.ladder import run_ladder
from varanneal_tpu.ops.action import pack
from varanneal_tpu.ops.spec import ProblemSpec


def make_ensemble_ladder(action, action_parts, betas, rf0, alpha, *,
                         lower=None, upper=None,
                         opts: Optional[LBFGSOptions] = None,
                         store_paths: bool = False,
                         mesh: Optional[Mesh] = None,
                         axis: str = "ens", **ladder_kwargs):
    """Build a jitted function mapping a batch of initial decision vectors
    (B, n_dof) to a batched LadderResult.

    With ``mesh``, inputs/outputs are sharded over ``axis`` (the batch
    dimension); without, it is a plain vmap on the default device.
    ``store_paths=False`` by default: for big ensembles the (B, Nβ, n_dof)
    path record dominates HBM (SURVEY.md §7).
    """
    opts = opts or LBFGSOptions()

    def one(xp0):
        return run_ladder(action, action_parts, xp0, betas, rf0, alpha,
                          lower=lower, upper=upper, opts=opts,
                          store_paths=store_paths, **ladder_kwargs)

    batched = jax.vmap(one)
    if mesh is None:
        return jax.jit(batched)

    in_shard = NamedSharding(mesh, P(axis, None))
    # every leaf of LadderResult has the batch as its leading axis; a
    # partial PartitionSpec shards dim 0 and replicates the rest
    out_shard = NamedSharding(mesh, P(axis))
    return jax.jit(batched, in_shardings=in_shard, out_shardings=out_shard)


def ensemble_mesh(n_devices: Optional[int] = None, axis: str = "ens") -> Mesh:
    """1-D device mesh over all (or the first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "ens"):
    """Place a (B, ...) batch with its leading axis sharded over the mesh."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def random_ensemble_inits(spec: ProblemSpec, n_members: int, seed: int = 0,
                          lo: float = -10.0, hi: float = 10.0,
                          init_to_data: bool = True, dtype=np.float64):
    """Reference-style ensemble initialization: uniform random paths with
    observed components optionally clamped to the data, shared P_base
    initial parameters. Returns (B, n_dof)."""
    rng = np.random.default_rng(seed)
    B = n_members
    X0 = rng.uniform(lo, hi, size=(B, spec.N_f, spec.D))
    if init_to_data:
        obs = np.arange(spec.N_data) * spec.obs_stride
        X0[:, obs[:, None], np.asarray(spec.Lidx)[None, :]] = spec.Y
    out = np.empty((B, spec.n_dof), dtype=dtype)
    for b in range(B):
        out[b] = np.asarray(pack(spec, jnp.asarray(X0[b])))
    return out
