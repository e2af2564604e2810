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


def draw_anchored_problem(action, action_parts, xp_batch, lower, upper, *,
                          n_params: int, weight: float, width: float = 0.25,
                          freeze_eps: float = 1e-5):
    """Draw-anchored weak MAP prior: multi-start regularized annealing.

    Wraps a (batched-over-members) annealing problem so each ensemble
    member's trailing ``n_params`` parameter coordinates are softly
    anchored to the member's OWN initial draw by a quadratic penalty
    ``weight * sum(((p - p_draw) / (width * box_width))**2)`` (a
    log-normal prior when the coordinate is estimated in log scale).

    Measured motivation (PARITY.md round-3 campaign): the annealing path
    drifts under-priced parameters to box edges long before the data
    prices them — truth-seeded NaKL members are expelled from the truth
    basin by rung 40 even at the record length where that basin ranks
    FIRST on action. A weak per-draw anchor removes the drift while
    keeping ensemble coverage: each member explores the basin nearest
    its draw, and the action ranking (at an adequate record) selects the
    truth basin. Follow with a prior-free polish from the snapshot
    (``strip_anchors``).

    The per-member anchor centers travel INSIDE the decision vector as
    ``n_params`` extra trailing coordinates, frozen by a degenerate
    per-member box (half-width ``freeze_eps`` of each parameter box) —
    run the result through ``run_ladder_checkpointed(..., batched=True,
    batched_bounds=True)`` or any solver honoring per-member bounds.

    Args: ``xp_batch`` (B, n_dof) initial decision vectors with the
    parameters as the trailing ``n_params`` coords; ``lower``/``upper``
    flat (n_dof,) bounds in estimation scale. Returns
    ``(action', parts', xp' (B, n_dof+n_params), lower' (B, ...),
    upper' (B, ...))``.
    """
    xp_batch = np.asarray(xp_batch)
    if xp_batch.ndim != 2:
        raise ValueError(f"xp_batch must be (B, n_dof), got {xp_batch.shape}")
    B, n_dof = xp_batch.shape
    npar = int(n_params)
    if not 0 < npar <= n_dof:
        raise ValueError(f"n_params={npar} out of range for n_dof={n_dof}")
    lo = np.asarray(lower, np.float64)
    hi = np.asarray(upper, np.float64)
    if lo.shape != (n_dof,) or hi.shape != (n_dof,):
        raise ValueError("lower/upper must be flat (n_dof,) arrays")
    wdt = hi[-npar:] - lo[-npar:]
    if np.any(wdt <= 0):
        raise ValueError("parameter bounds must have positive width")
    dtype = xp_batch.dtype
    cen = xp_batch[:, -npar:].astype(np.float64)
    xp_ext = np.concatenate([xp_batch, cen.astype(dtype)], axis=1)
    # freeze box in the TARGET dtype: for |center| large relative to the
    # box width, cen ± eps*wdt can round to cen itself (f32 ulp(cen) ≈
    # 6e-8|cen|), re-creating the lo==hi breakpoint pathology the δ-box
    # exists to avoid — widen each side to at least one representable
    # step past the center
    c_t = cen.astype(dtype)
    lo_a = np.minimum(np.asarray(cen - freeze_eps * wdt, dtype),
                      np.nextafter(c_t, np.asarray(-np.inf, dtype)))
    hi_a = np.maximum(np.asarray(cen + freeze_eps * wdt, dtype),
                      np.nextafter(c_t, np.asarray(np.inf, dtype)))
    lo_ext = np.concatenate(
        [np.tile(lo, (B, 1)).astype(dtype), lo_a], axis=1)
    hi_ext = np.concatenate(
        [np.tile(hi, (B, 1)).astype(dtype), hi_a], axis=1)

    jdt = jax.dtypes.canonicalize_dtype(xp_batch.dtype)
    lam = jnp.asarray(weight, jdt)
    iw2 = jnp.asarray(1.0 / (width * wdt) ** 2, jdt)

    def _pen(xp):
        dp = xp[-2 * npar:-npar] - xp[-npar:]
        return lam * jnp.sum(iw2 * dp * dp)

    def action_a(xp, rf):
        return action(xp[:-npar], rf) + _pen(xp)

    def parts_a(xp, rf):
        a, me, fe = action_parts(xp[:-npar], rf)
        return a + _pen(xp), me, fe

    return action_a, parts_a, xp_ext, lo_ext, hi_ext


def strip_anchors(xp, n_params: int):
    """Drop the anchor-center coordinates added by
    :func:`draw_anchored_problem` (last ``n_params`` of the trailing
    axis) — use before a prior-free polish on the standard problem."""
    return np.asarray(xp)[..., :-int(n_params)]
