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
                          init_to_data: bool = True, dtype=np.float64,
                          state_sampler=None, param_sampler=None):
    """Reference-style ensemble initialization: uniform random paths with
    observed components optionally clamped to the data, shared P_base
    initial parameters. Returns (B, n_dof).

    Fully vectorized (one batched pack, no per-member Python loop — matters
    at B=4096+). Custom init distributions:

    - ``state_sampler(rng, shape)`` -> (B, N_f, D) initial paths
      (default: uniform on [lo, hi));
    - ``param_sampler(rng, shape)`` -> (B, n_par) estimated-parameter
      initials (default: every member starts at P_base's estimated entries).
    """
    rng = np.random.default_rng(seed)
    B = n_members
    sample = state_sampler or (lambda r, shape: r.uniform(lo, hi, shape))
    X0 = np.asarray(sample(rng, (B, spec.N_f, spec.D)), dtype=np.float64)
    if X0.shape != (B, spec.N_f, spec.D):
        raise ValueError(
            f"state_sampler returned {X0.shape}, expected "
            f"{(B, spec.N_f, spec.D)}")
    if init_to_data:
        obs = np.arange(spec.N_data) * spec.obs_stride
        X0[:, obs[:, None], np.asarray(spec.Lidx)[None, :]] = spec.Y
    parts = [X0.reshape(B, spec.n_state)]
    if spec.n_par:
        if param_sampler is not None:
            pe = np.asarray(param_sampler(rng, (B, spec.n_par)),
                            dtype=np.float64)
            if pe.shape != (B, spec.n_par):
                raise ValueError(
                    f"param_sampler returned {pe.shape}, expected "
                    f"{(B, spec.n_par)}")
        else:
            P = np.asarray(spec.P_base)
            pcols = np.asarray(spec.pidx)
            base = (P[:, pcols].reshape(-1) if spec.time_dep_p
                    else P[pcols])
            pe = np.broadcast_to(base, (B, spec.n_par))
        parts.append(pe)
    return np.concatenate(parts, axis=1).astype(dtype) if len(parts) > 1 \
        else parts[0].astype(dtype)
