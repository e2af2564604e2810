"""BASELINE config #5: ensemble sweep — many random initializations of a
large Lorenz-96 problem, vmapped β ladders sharded across the device mesh.
The action-level-vs-β scatter over the ensemble is THE core diagnostic of
the VA method (the plot that reveals the global-minimum action level).

Defaults scale to the hardware: full config is 1024 inits x D=400 (sized
for a v5p-8); --small runs 32 x D=20 anywhere.

Run:  python examples/ensemble_sweep.py [--small] [--ninit N] [--d D]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--ninit", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--nbeta", type=int, default=None)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--maxcor", type=int, default=5,
                    help="L-BFGS history size m (memory: ~2*m*n_dof*B "
                         "floats — the dominant HBM cost of big sweeps)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="run the ladder in beta-chunks of this size "
                         "(shorter device dispatches; 0 = one dispatch)")
    ap.add_argument("--once", action="store_true",
                    help="single timed run (compile included; chunked "
                         "ladders amortize it) — for very large sweeps")
    ap.add_argument("--engine", type=str, default="auto",
                    choices=["auto", "xla", "pallas", "ag"],
                    help="action engine: auto picks the measured winner "
                         "per regime — the whole-problem fused "
                         "action+grad kernel ('ag') at D>=256 one-step "
                         "f32 (5.7x XLA at this config), XLA otherwise")
    ap.add_argument("--solver", default="auto",
                    choices=["auto", "fused", "xla"],
                    help="inner solver: 'fused' = whole-solve Pallas "
                         "kernel (ONE launch per rung per member, "
                         "kernels/solve_pallas.py); 'auto' uses it "
                         "where solve_supported() holds (TPU, f32, "
                         "unbounded, VMEM fits)")
    ap.add_argument("--batch-chunk", type=int, default=0,
                    help="process the ensemble in member-chunks of this "
                         "size (one chip bounds per-dispatch size; a "
                         "v5p-8 would shard members across chips instead)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec
    from varanneal_tpu.kernels.fe_pallas import select_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import (
        ensemble_mesh, shard_batch, random_ensemble_inits)

    D = args.d or (20 if args.small else 400)
    B = args.ninit or (32 if args.small else 1024)
    n_beta = args.nbeta or (16 if args.small else 101)
    N_data = 41 if args.small else 161
    n_obs = max(1, D * 2 // 5)

    tw = lorenz96_twin(D=D, N_data=N_data, n_obs=n_obs)
    spec = build_spec(lorenz96, D, tw["Y"], tw["t"], tw["Lidx"], tw["RM"],
                      disc="trapezoid", P=np.array([4.0]), pidx=[0])

    n_dev = len(jax.devices())
    mesh = ensemble_mesh(n_dev) if n_dev > 1 else None
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    mem_gb = 2 * args.maxcor * spec.n_dof * B * np.dtype(dtype).itemsize / 2**30
    print(f"ensemble sweep: D={D}, B={B} inits, {n_beta} betas, "
          f"{n_dev} device(s), dtype={np.dtype(dtype).name}, "
          f"n_dof={spec.n_dof}, ~{mem_gb:.1f} GiB history")

    opts = LBFGSOptions(maxiter=args.maxiter, m=args.maxcor,
                        pgtol=1e-8 if dtype == np.float64 else 1e-4,
                        ftol=2.2e-9 if dtype == np.float64 else 1e-6)
    rf0 = dtype(4e-6 * tw["RM"])
    action, parts = select_action(spec, rf0, engine=args.engine,
                                  dtype=dtype)
    print(f"engine: {action.engine}")
    betas_all = np.arange(n_beta, dtype=dtype)
    chunk = args.chunk or n_beta

    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.kernels import solve_pallas

    ladder_kw = {}
    if args.solver in ("auto", "fused") and solve_pallas.solve_supported(
            spec, rf0, opts, dtype=dtype):
        ladder_kw = dict(rung_solver=solve_pallas.make_rung_solver(spec,
                                                                   opts))
        print("solver: whole-solve Pallas kernel (one launch per rung)")
    elif args.solver == "fused":
        print("solver: fused requested but unsupported here "
              "(solve_supported() false) — generic loop", file=sys.stderr)

    # betas are a TRACED argument so every equal-length chunk shares one
    # compile (short device dispatches; warm-started carry across chunks)
    ladder_chunk = jax.jit(jax.vmap(
        lambda xp, bc: run_ladder(action, parts, xp, bc, rf0, 1.5,
                                  opts=opts, store_paths=False,
                                  **ladder_kw),
        in_axes=(0, None)))

    def run_members(xp):
        A_parts, me_parts, fe_parts, nfev_parts = [], [], [], []
        for lo in range(0, n_beta, chunk):
            bc = jnp.asarray(betas_all[lo: lo + chunk])
            r = ladder_chunk(xp, bc)
            jax.block_until_ready(r.A)
            xp = r.XP
            A_parts.append(np.asarray(r.A))
            me_parts.append(np.asarray(r.ME))
            fe_parts.append(np.asarray(r.FE))
            nfev_parts.append(np.asarray(r.nfev))
        return (np.concatenate(A_parts, axis=1),
                np.concatenate(me_parts, axis=1),
                np.concatenate(fe_parts, axis=1),
                np.concatenate(nfev_parts, axis=1), xp)

    bchunk = args.batch_chunk or B

    def run_all(xp):
        outs = []
        for mlo in range(0, B, bchunk):
            outs.append(run_members(xp[mlo: mlo + bchunk]))
            if B > bchunk:
                print(f"  members [{mlo}:{mlo + bchunk}] done", flush=True)

        class R:  # minimal result bundle
            A = np.concatenate([o[0] for o in outs], axis=0)
            ME = np.concatenate([o[1] for o in outs], axis=0)
            FE = np.concatenate([o[2] for o in outs], axis=0)
            nfev = np.concatenate([o[3] for o in outs], axis=0)
            XP = (jnp.concatenate([o[4] for o in outs], axis=0)
                  if len(outs) > 1 else outs[0][4])
        return R

    xp0 = random_ensemble_inits(spec, B, seed=12, dtype=dtype)
    xp0 = shard_batch(xp0, mesh) if mesh is not None else jnp.asarray(xp0)

    if args.once:
        t0 = time.time()
        res = run_all(xp0)
        t1 = time.time()
        tag = "incl. compile"
    else:
        res = run_all(xp0)             # compile + run
        t0 = time.time()
        res = run_all(xp0)
        t1 = time.time()
        tag = "compiled"

    A = np.asarray(res.A)              # (B, n_beta)
    final = A[:, -1]
    print(f"wall {t1 - t0:.2f}s {tag} "
          f"({(t1 - t0) / B * 1e3:.2f} ms/init/ladder), "
          f"total action+grad evals {int(np.asarray(res.nfev).sum())}")
    qs = np.percentile(final, [0, 25, 50, 75, 100])
    print("final action level percentiles [min/25/50/75/max]:",
          np.array2string(qs, precision=4))
    n_best = int(np.sum(final <= qs[0] * 1.01 + 1e-12))
    print(f"{n_best}/{B} members reached the lowest action level "
          f"(the consistent level identifies the global minimum)")
    np.save("ensemble_action_levels.npy", A)
    print("saved ensemble_action_levels.npy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
