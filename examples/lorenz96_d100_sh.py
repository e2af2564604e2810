"""BASELINE config #2: Lorenz-96 D=100 with Hermite–Simpson collocation and
sparse/noisy observations (40 of 100 components observed, sigma=1.0).

L=40 of D=100 sits at the observability boundary (L_c ~ D/2.5 — the
measured D=20 transition curve is benchmarks/l96_observability.py), so a
single init is not reliable here; `--ninit B` runs the vmapped ensemble
ladder and ranks members by final action. Measured on the TPU (61-rung
ladder, maxiter 800): single init lands at A=4.23, F −1.0 %; the B=8
ensemble minimum lands at A=2.64, F −0.0 % — the action ranking buys the
parameter back even where the unobserved states stay underdetermined.

Run:  python examples/lorenz96_d100_sh.py [--small] [--ninit 8]
"""

import argparse
import sys
import time

import numpy as np


def run_ensemble(args, tw, D, n_beta, N_data):
    """B-member vmapped ladder through the library API, ranked by final
    action — the framework's own recipe for a config at the observability
    boundary (see benchmarks/l96_observability.py for the D=20 study)."""
    import time
    import numpy as np
    import jax.numpy as jnp
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import random_ensemble_inits
    from varanneal_tpu.anneal import run_ladder_checkpointed

    spec = build_spec(lorenz96, D, tw["Y"], tw["t"], tw["Lidx"], tw["RM"],
                      disc="SimpsonHermite", P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    xp0 = jnp.asarray(random_ensemble_inits(spec, args.ninit, seed=1))
    opts = LBFGSOptions(maxiter=args.maxiter)
    t0 = time.time()
    res = run_ladder_checkpointed(
        action, parts, xp0, np.arange(n_beta), np.float64(1e-4), 1.6,
        opts=opts, store_paths=False, batched=True,
        ckpt_path=args.ckpt or None, save_every=args.ckpt_every,
        meta=dict(ninit=args.ninit, seed=1, maxiter=args.maxiter),
        verbose=True)
    t1 = time.time()

    xp = np.asarray(res.XP, np.float64)            # (B, n_dof)
    A_fin = np.asarray(res.A, np.float64)[:, -1]
    X = xp[:, :spec.N_f * D].reshape(args.ninit, spec.N_f, D)[:, ::2]
    F_est = xp[:, -1]
    err = X - tw["traj"][None]
    n0, n1 = N_data // 5, N_data - N_data // 5
    unobs = np.setdiff1d(np.arange(D), np.asarray(tw["Lidx"]))
    r_obs = np.sqrt((err[:, n0:n1][:, :, tw["Lidx"]] ** 2).mean((1, 2)))
    r_unobs = np.sqrt((err[:, n0:n1][:, :, unobs] ** 2).mean((1, 2)))
    ok = (r_unobs < 1.0) & (np.abs(F_est / tw["F"] - 1) < 0.1)
    best = int(np.argmin(A_fin))
    print(f"wall {t1 - t0:.2f}s | ensemble B={args.ninit}: "
          f"recovered {int(ok.sum())}/{args.ninit} "
          f"(interior unobs RMSE < 1 and F err < 10%)")
    print(f"min-action member {best}: F = {F_est[best]:.4f} "
          f"(truth {tw['F']}, {100 * (F_est[best] / tw['F'] - 1):+.1f}%) | "
          f"interior RMSE obs {r_obs[best]:.3f} / unobs {r_unobs[best]:.3f} "
          f"(noise {tw['sigma']}) | recovered? {bool(ok[best])}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--maxiter", type=int, default=800)
    ap.add_argument("--ckpt", type=str, default="l96_d100_ckpt.npz",
                    help="checkpoint path; chunks the ladder into short "
                         "resumable device dispatches (some TPU runtimes "
                         "kill single dispatches over ~60 s) — '' disables")
    ap.add_argument("--ckpt-every", type=int, default=2)
    ap.add_argument("--ninit", type=int, default=1,
                    help="ensemble size; >1 runs the vmapped library "
                         "ladder and ranks members by final action "
                         "(L=40 of D=100 sits at the observability "
                         "boundary L_c~D/2.5 — a single init is not "
                         "reliable there, the ensemble minimum is)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)

    import varanneal_tpu
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.twin import lorenz96_twin

    D = 40 if args.small else 100
    n_obs = 16 if args.small else 40
    N_data = 41 if args.small else 121
    n_beta = 16 if args.small else 61
    tw = lorenz96_twin(D=D, N_data=N_data, n_obs=n_obs, sigma=1.0)
    print(f"Lorenz-96 D={D}, L={n_obs} sparse obs, SimpsonHermite, "
          f"N={N_data} (doubled grid {2 * N_data - 1})")

    if args.ninit > 1:
        return run_ensemble(args, tw, D, n_beta, N_data)

    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, D)
    ann.set_data(tw["Y"], t=tw["t"])

    rng = np.random.default_rng(1)
    X0 = rng.uniform(-10, 10, size=(N_data, D))
    P0 = np.array([4.0])

    t0 = time.time()
    ann.anneal(X0, P0, alpha=1.6, beta_array=np.arange(n_beta),
               RM=tw["RM"], RF0=1e-4, Lidx=tw["Lidx"], Pidx=[0],
               disc="SimpsonHermite",
               opt_args=dict(maxiter=args.maxiter), verbose=True,
               checkpoint_path=args.ckpt or None,
               checkpoint_every=args.ckpt_every)
    t1 = time.time()

    F_est = ann.minpaths_P[-1, 0]
    # compare on the data grid (even points of the doubled grid); score
    # the window INTERIOR (middle 3/5) — the boundary segments of a
    # variational estimate are pinned by data on one side only and their
    # error is a window artifact (same protocol as
    # benchmarks/l96_observability.py)
    X_est = ann.minpaths_X[-1][::2]
    err = X_est - tw["traj"]
    n0, n1 = N_data // 5, N_data - N_data // 5
    unobs = np.setdiff1d(np.arange(D), np.asarray(tw["Lidx"]))
    rmse_obs = np.sqrt(np.mean(err[n0:n1][:, tw["Lidx"]] ** 2))
    rmse_unobs = np.sqrt(np.mean(err[n0:n1][:, unobs] ** 2))
    rmse_full = np.sqrt(np.mean(err[:, tw["Lidx"]] ** 2))
    print(f"wall {t1 - t0:.2f}s | F = {F_est:.4f} (truth {tw['F']}) | "
          f"interior RMSE obs {rmse_obs:.3f} / unobs {rmse_unobs:.3f} "
          f"(noise {tw['sigma']}) | full-window obs RMSE {rmse_full:.3f}")
    ann.save_action_errors("l96_d100_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
