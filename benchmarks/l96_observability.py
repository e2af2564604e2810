"""Observability phase transition for Lorenz-96 D=20 — the literature
oracle's own validation experiment, measured end-to-end on this framework.

The reference's de-facto test strategy is "literature as oracle"
(SURVEY.md §4): the group's published Lorenz-96 results (Ye, Rey,
Kadakia, Rozdeba, Abarbanel, Quinn, PRE 92 052901 (2015); Quinn's UCSD
dissertation) establish that at fixed noise and record length, variational
annealing switches from failure to success at a critical number of
observed state variables L_c — for D=20 at sigma=0.5, L_c ~ 7-8. Below
the transition the ensemble's action levels stay split and high and the
unobserved states (and the forcing parameter F) come out wrong; at and
above it the lowest action level becomes consistent across the ensemble
and the unobserved states track truth. The canonical bundled example
(L=8 of D=20) sits just above the transition — this sweep measures the
whole curve, the published figure class the reference was built to
reproduce.

Protocol per L — the framework's own measured two-phase recipe
(PARITY.md "f32 vs f64 quality"): a B-member ensemble of random
initializations runs the full f32 beta ladder (whole-solve Pallas kernel
where supported), then a short f64 TAIL re-anneals the last --tail rungs
per member, because the f32 final action saturates at its round-off
floor and cannot rank members — the tail restores an accuracy-grade
action for selection. Estimation quality is scored on the INTERIOR of
the window (the middle 3/5): the boundary segments of a variational
estimate are pinned by data on one side only and their error is a
window artifact, not an observability signal.

Success per member: F error < 10% AND interior unobserved-state RMSE
< 1.0 (recovered members sit near the 0.5 observation noise; failed
ones at the ~3.6 climatological spread — the gap is wide).

The ladder is dispatched in beta chunks (default 26) because this
testbed's TPU runtime kills single device dispatches running ~60 s
(CLAUDE.md measured gotchas); chunking is warm-started and exact. The
f64 tail always runs on the CPU backend (one rung per dispatch would
still risk the kill at 44x f64 emulation on this TPU).

Usage:
  python benchmarks/l96_observability.py                  # full sweep
  python benchmarks/l96_observability.py --small          # CPU smoke
  ... [--nobs 2,3,4,5,6,7,8,10,12] [--ninit 32] [--save x.npz]
      [--fig x.png] [--solver fused|xla] [--cpu]
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

# results[L] fields that are python scalars (everything else is ndarray)
_SCALARS = ("frac_ok", "frac_low", "best", "wall", "nfev")


def _ckpt_meta(args):
    """The run config a checkpoint must match to be resumable (chunking
    is excluded: chunk boundaries are warm-started and exact, so results
    are chunk-invariant)."""
    return dict(D=args.D, record_n=args.record_n, ninit=args.ninit,
                nbeta=args.nbeta, maxiter=args.maxiter, tail=args.tail,
                seed=args.seed, data_seed=args.data_seed,
                solver=args.solver, rmse_thresh=args.rmse_thresh)


def _flatten(results, meta, F_true):
    flat = {"meta": json.dumps(meta), "F_true": np.float64(F_true)}
    for L, r in results.items():
        for k, v in r.items():
            flat[f"L{L}_{k}"] = v
    return flat


def _unflatten(d):
    out = {}
    for key in d.files:
        m = re.match(r"^L(\d+)_(.+)$", key)
        if not m:
            continue
        L, k = int(m.group(1)), m.group(2)
        v = d[key]
        out.setdefault(L, {})[k] = v.item() if v.ndim == 0 else v
    return out


def _save_ckpt(path, results, meta, F_true):
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **_flatten(results, meta, F_true))
    os.replace(tmp, path)


def run_sweep(args):
    import jax
    import jax.numpy as jnp

    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import random_ensemble_inits
    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.kernels import solve_pallas

    D = args.D
    dtype = np.float32
    nobs_list = [int(s) for s in args.nobs.split(",")]
    betas_all = np.arange(args.nbeta, dtype=dtype)
    opts = LBFGSOptions(maxiter=args.maxiter, pgtol=1e-4, ftol=1e-6)
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = jax.devices()[0]

    # per-L checkpoint: a TPU-worker hang kills the whole sweep (measured
    # this round); completed Ls are resumed instead of re-run
    meta = _ckpt_meta(args)
    done, F_true = {}, None
    if args.ckpt and os.path.exists(args.ckpt):
        d = np.load(args.ckpt, allow_pickle=False)
        if json.loads(str(d["meta"])) == meta:
            done = _unflatten(d)
            F_true = float(d["F_true"])
            print(f"[ckpt] resuming, already done: L={sorted(done)}",
                  file=sys.stderr, flush=True)
        else:
            print("[ckpt] config mismatch — ignoring checkpoint",
                  file=sys.stderr, flush=True)

    results = {}
    for L in nobs_list:
        if L in done:
            results[L] = done[L]
            print(f"L={L:2d}: resumed from checkpoint", flush=True)
            continue
        tw = lorenz96_twin(D=D, N_data=args.record_n, n_obs=L,
                           seed=args.data_seed)
        F_true = tw["F"]
        spec = build_spec(lorenz96, D, tw["Y"], tw["t"], tw["Lidx"],
                          tw["RM"], disc="trapezoid",
                          P=np.array([4.0]), pidx=[0])
        action, parts = make_action(spec)
        rf0 = dtype(4e-6 * tw["RM"])
        ladder_kw = {}
        if args.solver == "fused" and solve_pallas.solve_supported(
                spec, dtype(1.0), opts, dtype=dtype):
            ladder_kw = dict(
                rung_solver=solve_pallas.make_rung_solver(spec, opts))

        # one jitted chunk fn per L; betas are TRACED so every chunk of
        # the same length shares the compile
        chunk_fn = jax.jit(jax.vmap(
            lambda xp, bs: run_ladder(
                action, parts, xp, bs, rf0, 1.5, opts=opts,
                store_paths=False, **ladder_kw),
            in_axes=(0, None)))

        xp = jnp.asarray(random_ensemble_inits(
            spec, args.ninit, seed=args.seed, dtype=dtype))
        A_curve = []
        t0 = time.perf_counter()
        nfev = 0
        for i0 in range(0, args.nbeta, args.chunk):
            bs = jnp.asarray(betas_all[i0:i0 + args.chunk])
            r = chunk_fn(xp, bs)
            xp = r.XP
            A_curve.append(np.asarray(r.A, np.float64))
            nfev += int(np.asarray(r.nfev).sum())
        # host transfer as the timing barrier (block_until_ready returns
        # early through the tunneled PJRT plugin — CLAUDE.md)
        xp_h = np.asarray(xp, np.float64)
        wall = time.perf_counter() - t0
        A_curve = np.concatenate(A_curve, axis=1)       # (B, nbeta)

        # f64 tail on CPU: re-anneal the last --tail rungs from the f32
        # endpoint to get an accuracy-grade action for member ranking
        # (the f32 final action is round-off-floor noise — PARITY.md)
        A_tail = None
        if args.tail > 0:
            jax.config.update("jax_enable_x64", True)
            spec64 = build_spec(lorenz96, D, tw["Y"].astype(np.float64),
                                tw["t"], tw["Lidx"], tw["RM"],
                                disc="trapezoid", P=np.array([4.0]),
                                pidx=[0])
            act64, parts64 = make_action(spec64)
            opts64 = LBFGSOptions(maxiter=4 * args.maxiter, pgtol=1e-8,
                                  ftol=2.22e-9)
            tail_betas = jnp.asarray(
                np.arange(args.nbeta - args.tail, args.nbeta, dtype=np.float64))
            tail_fn = jax.jit(jax.vmap(
                lambda z, bs: run_ladder(
                    act64, parts64, z, bs, np.float64(rf0), 1.5,
                    opts=opts64, store_paths=False),
                in_axes=(0, None)))
            # CPU placement via operands (jit follows committed inputs)
            rt = tail_fn(jax.device_put(jnp.asarray(xp_h), cpu0),
                         jax.device_put(tail_betas, cpu0))
            xp_h = np.asarray(rt.XP, np.float64)
            A_tail = np.asarray(rt.A, np.float64)[:, -1]
            nfev += int(np.asarray(rt.nfev).sum())

        X = xp_h[:, :spec.N_f * D].reshape(-1, spec.N_f, D)
        F_est = xp_h[:, -1]
        F_err = 100 * np.abs(F_est / tw["F"] - 1)
        unobs = np.setdiff1d(np.arange(D), np.asarray(tw["Lidx"]))
        err = X - tw["traj"][None]
        n0, n1 = spec.N_f // 5, spec.N_f - spec.N_f // 5   # interior 3/5
        rmse_unobs = np.sqrt(
            (err[:, n0:n1][:, :, unobs] ** 2).mean(axis=(1, 2)))
        rmse_full = np.sqrt((err[:, :, unobs] ** 2).mean(axis=(1, 2)))
        ok = (rmse_unobs < args.rmse_thresh) & (F_err < 10.0)
        A_rank = A_tail if A_tail is not None else A_curve[:, -1]
        best = int(np.argmin(A_rank))
        # action-level consistency: fraction of members whose ranked
        # action sits within 5% of the ensemble minimum (the "lowest
        # consistent level" of the published action-level plots)
        frac_low = float((A_rank < 1.05 * A_rank.min()).mean())
        results[L] = dict(
            Lidx=np.asarray(tw["Lidx"]), A_curve=A_curve,
            A_rank=A_rank, rmse_unobs=rmse_unobs, rmse_full=rmse_full,
            F_est=F_est, ok=ok, frac_ok=float(ok.mean()),
            frac_low=frac_low, best=best, wall=wall, nfev=nfev)
        print(f"L={L:2d}: recovered {int(ok.sum())}/{args.ninit}, "
              f"interior unobs RMSE med {np.median(rmse_unobs):.3f} / "
              f"best {rmse_unobs.min():.3f}, "
              f"min-action member: F "
              f"{100 * (F_est[best] / tw['F'] - 1):+.1f}%, "
              f"RMSE {rmse_unobs[best]:.3f}, "
              f"frac@lowest-level {frac_low:.2f}, "
              f"{wall:.1f}s ladder / {nfev} evals", flush=True)
        if args.ckpt:
            _save_ckpt(args.ckpt, results, meta, F_true)
    return results, F_true


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nobs", default="2,3,4,5,6,7,8,10,12")
    ap.add_argument("--D", type=int, default=20)
    ap.add_argument("--record-n", type=int, default=161)
    ap.add_argument("--ninit", type=int, default=32)
    ap.add_argument("--nbeta", type=int, default=101)
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=26)
    ap.add_argument("--tail", type=int, default=10,
                    help="f64 tail depth for member ranking (0 = off)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--data-seed", type=int, default=2027)
    ap.add_argument("--rmse-thresh", type=float, default=1.0)
    ap.add_argument("--solver", default="fused", choices=["fused", "xla"])
    ap.add_argument("--save", default="")
    ap.add_argument("--ckpt", default=None,
                    help="per-L resume checkpoint; defaults to "
                         "<save>.part.npz when --save is given")
    ap.add_argument("--fig", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="CPU smoke: tiny record/ladder/ensemble")
    args = ap.parse_args()
    if args.small:
        args.cpu = True
        args.nobs = "4,8"
        args.record_n, args.nbeta, args.ninit = 41, 21, 4
        args.maxiter, args.chunk, args.tail = 150, 11, 4
        args.solver = "xla"
    if args.cpu:
        import jax
        # env JAX_PLATFORMS is too late when a sitecustomize pre-imported
        # jax (CLAUDE.md gotcha) — force the platform on the live config
        jax.config.update("jax_platforms", "cpu")
    if args.ckpt is None:
        args.ckpt = args.save + ".part.npz" if args.save else ""

    results, F_true = run_sweep(args)

    Ls = sorted(results)
    summary = {
        "L": Ls,
        "frac_ok": [results[L]["frac_ok"] for L in Ls],
        "frac_low": [results[L]["frac_low"] for L in Ls],
        "rmse_unobs_med": [float(np.median(results[L]["rmse_unobs"]))
                           for L in Ls],
        "rmse_unobs_best": [float(results[L]["rmse_unobs"].min())
                            for L in Ls],
        "minA_rmse": [float(results[L]["rmse_unobs"][results[L]["best"]])
                      for L in Ls],
        "minA_F_err_pct": [
            float(100 * (results[L]["F_est"][results[L]["best"]]
                         / F_true - 1)) for L in Ls],
    }
    print(json.dumps(summary))

    if args.save:
        flat = {"summary": json.dumps(summary)}
        for L in Ls:
            for k, v in results[L].items():
                if isinstance(v, np.ndarray):
                    flat[f"L{L}_{k}"] = v
        np.savez_compressed(args.save, **flat)
        print(f"saved {args.save}", file=sys.stderr)

    if args.fig:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
        ax1.plot(Ls, summary["frac_ok"], "o-",
                 label="recovered fraction")
        ax1.plot(Ls, summary["frac_low"], "s--",
                 label="frac @ lowest action level")
        ax1.set_xlabel("observed variables L (of D=%d)" % args.D)
        ax1.set_ylabel("ensemble fraction")
        ax1.set_ylim(-0.05, 1.05)
        ax1.legend(fontsize=8)
        ax2.semilogy(Ls, summary["rmse_unobs_med"], "o-", label="median")
        ax2.semilogy(Ls, summary["minA_rmse"], "s--",
                     label="min-action member")
        ax2.axhline(0.5, color="gray", lw=0.8, ls=":",
                    label="obs noise sigma")
        ax2.set_xlabel("observed variables L")
        ax2.set_ylabel("interior unobserved-state RMSE")
        ax2.legend(fontsize=8)
        fig.suptitle("Lorenz-96 D=%d observability transition "
                     "(B=%d ensemble per L)" % (args.D, args.ninit))
        fig.tight_layout()
        fig.savefig(args.fig, dpi=120)
        print(f"saved {args.fig}", file=sys.stderr)


if __name__ == "__main__":
    main()
