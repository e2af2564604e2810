"""Annealing vs direct optimization — the method's core premise, measured.

Variational annealing exists because minimizing the action directly at
the final (large) model-precision RF is a non-convex trap: the
literature oracle's founding result (Ye, Rey, Kadakia, Rozdeba,
Abarbanel, Quinn, PRE 92 052901 (2015), Fig. 1-class plots; SURVEY.md
§4 "literature as oracle") is that slowly raising RF = RF0·alpha^beta
tracks the data-consistent minimum from the convex RF→0 limit, while a
direct descent at RF_max lands in whichever of the exponentially many
local minima the initialization happened to sit under. The reference
implements only the ladder; this benchmark measures the premise itself,
holding everything else fixed — same twin data, same ensemble of random
initializations, same optimizer, same (or larger) iteration budget:

  arm "anneal":  the full ladder, beta = 0..nbeta-1, maxiter per rung;
  arm "coarse":  every --stride'th rung (an under-resolved ladder — the
                 annealing *dose* matters, not just endpoints);
  arm "direct":  one solve at beta_max with the ENTIRE ladder iteration
                 budget (nbeta * maxiter) available to the single rung.

Scored like benchmarks/l96_observability.py: a member is recovered when
its interior (middle 3/5) unobserved-state RMSE < --rmse-thresh and the
estimated forcing F is within 10% of truth. Actions are re-evaluated in
f64 at beta_max from each arm's endpoints so the arms rank on one
accuracy-grade scale (the f32 final action is round-off noise —
PARITY.md dtype study).

Canonical config: Lorenz-96 D=20, L=8 observed, N=161, trapezoid,
F estimated from 4.0, RF0 = 4e-6·RM, alpha = 1.5, nbeta = 101.

Usage:
  python benchmarks/anneal_vs_direct.py --cpu            # f64, one core
  python benchmarks/anneal_vs_direct.py                  # f32, device
  ... [--ninit 32] [--nbeta 101] [--maxiter 500] [--stride 10]
      [--save x.npz] [--small]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def run(args):
    import jax
    import jax.numpy as jnp

    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import random_ensemble_inits
    from varanneal_tpu.anneal import run_ladder

    D = 20
    dtype = np.float64 if args.f64 else np.float32
    tw = lorenz96_twin(D=D, N_data=args.record_n, n_obs=8,
                       seed=args.data_seed)
    spec = build_spec(lorenz96, D, tw["Y"].astype(dtype), tw["t"],
                      tw["Lidx"], tw["RM"], disc="trapezoid",
                      P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    rf0 = dtype(4e-6 * tw["RM"])
    betas_full = np.arange(args.nbeta, dtype=dtype)
    xp0 = jnp.asarray(random_ensemble_inits(
        spec, args.ninit, seed=args.seed, dtype=dtype))

    # the three arms: (name, beta schedule, maxiter per rung) — the
    # direct arm gets the whole ladder budget in its single rung
    arms = [
        ("anneal", betas_full, args.maxiter),
        ("direct", betas_full[-1:], args.nbeta * args.maxiter),
        ("coarse", betas_full[::args.stride], args.maxiter),
    ]

    # accuracy-grade scoring action: f64 at beta_max (evaluation only,
    # no re-solve — one scale for all arms)
    spec64 = build_spec(lorenz96, D, tw["Y"].astype(np.float64), tw["t"],
                        tw["Lidx"], tw["RM"], disc="trapezoid",
                        P=np.array([4.0]), pidx=[0])
    act64, _ = make_action(spec64)
    rf_max = np.float64(rf0) * 1.5 ** float(betas_full[-1])
    score_A = jax.jit(jax.vmap(
        lambda z: act64(z.astype(jnp.float64), jnp.float64(rf_max))))

    unobs = np.setdiff1d(np.arange(D), np.asarray(tw["Lidx"]))
    n0, n1 = spec.N_f // 5, spec.N_f - spec.N_f // 5      # interior 3/5

    results = {}
    for name, bet, maxiter in arms:
        opts = LBFGSOptions(maxiter=maxiter, pgtol=1e-4, ftol=1e-6)
        chunk_fn = jax.jit(jax.vmap(
            lambda xp, bs, _o=opts: run_ladder(
                action, parts, xp, bs, rf0, 1.5, opts=_o,
                store_paths=False),
            in_axes=(0, None)))
        xp, nfev = xp0, 0
        A_curve = []
        t0 = time.perf_counter()
        for i0 in range(0, len(bet), args.chunk):
            r = chunk_fn(xp, jnp.asarray(bet[i0:i0 + args.chunk]))
            xp = r.XP
            A_curve.append(np.asarray(r.A, np.float64))
            nfev += int(np.asarray(r.nfev).sum())
        xp_h = np.asarray(xp, np.float64)  # host transfer = barrier
        wall = time.perf_counter() - t0
        A_curve = np.concatenate(A_curve, axis=1)

        X = xp_h[:, :spec.N_f * D].reshape(-1, spec.N_f, D)
        F_est = xp_h[:, -1]
        F_err = 100 * np.abs(F_est / tw["F"] - 1)
        err = X - tw["traj"][None]
        rmse_unobs = np.sqrt(
            (err[:, n0:n1][:, :, unobs] ** 2).mean(axis=(1, 2)))
        ok = (rmse_unobs < args.rmse_thresh) & (F_err < 10.0)
        A64 = np.asarray(score_A(jnp.asarray(xp_h)), np.float64)
        best = int(np.argmin(A64))
        results[name] = dict(
            A_curve=A_curve, A64=A64, rmse_unobs=rmse_unobs,
            F_est=F_est, ok=ok, frac_ok=float(ok.mean()),
            best=best, wall=float(wall), nfev=int(nfev),
            n_rungs=len(bet))
        print(f"{name:>6s}: recovered {int(ok.sum())}/{args.ninit} "
              f"| unobs RMSE med {np.median(rmse_unobs):.3f} best "
              f"{rmse_unobs.min():.3f} "
              f"| min-action member: A64 {A64[best]:.4g}, "
              f"RMSE {rmse_unobs[best]:.3f}, "
              f"F {100 * (F_est[best] / tw['F'] - 1):+.1f}% "
              f"| {nfev} evals, {wall:.1f}s", flush=True)

        # incremental save after EVERY arm: the CPU f64 canonical run
        # is hours on one core and the testbed VMs die mid-campaign
        # (CLAUDE.md); a partial save with the anneal+direct arms
        # already carries the premise measurement
        if args.save:
            flat = {"meta": json.dumps(dict(
                ninit=args.ninit, nbeta=args.nbeta,
                maxiter=args.maxiter, stride=args.stride,
                record_n=args.record_n, seed=args.seed,
                data_seed=args.data_seed, f64=bool(args.f64),
                rmse_thresh=args.rmse_thresh)),
                "F_true": np.float64(tw["F"])}
            for nm, rv in results.items():
                for k, v in rv.items():
                    flat[f"{nm}_{k}"] = v
            # atomic replace: a VM death mid-write must not destroy the
            # previous good partial save (ADVICE r3)
            tmp = args.save + ".tmp"
            with open(tmp, "wb") as fh:     # file object: savez would
                np.savez_compressed(fh, **flat)  # append .npz to a path
            os.replace(tmp, args.save)
            print(f"saved -> {args.save}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ninit", type=int, default=32)
    ap.add_argument("--record-n", type=int, default=161)
    ap.add_argument("--nbeta", type=int, default=101)
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=26)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--data-seed", type=int, default=2027)
    ap.add_argument("--rmse-thresh", type=float, default=1.0)
    ap.add_argument("--save", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true",
                    help="run the arms in f64 (default with --cpu)")
    ap.add_argument("--small", action="store_true",
                    help="CPU smoke: tiny record/ladder/ensemble")
    args = ap.parse_args()
    if args.small:
        args.cpu = True
        args.record_n, args.nbeta, args.ninit = 41, 21, 4
        args.maxiter, args.stride, args.chunk = 150, 5, 11
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.f64 = True
    if args.f64:
        import jax
        jax.config.update("jax_enable_x64", True)
    run(args)


if __name__ == "__main__":
    main()
