"""Canonical example (BASELINE config #1): Lorenz-96 twin experiment,
D=20, L=8 observed, trapezoid discretization, N=161, full β ladder —
the TPU-native equivalent of the reference's bundled CPU example, run the
way the method prescribes: an ensemble of random initializations, vmapped
on-device, with the estimate taken from the lowest consistent action level.

Run:  python examples/lorenz96_d20.py [--small] [--f32] [--ninit B]
Outputs: l96_paths.npy, l96_params.npy, l96_action_errors.dat,
         l96_action_levels.png
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced config for a quick smoke run")
    ap.add_argument("--f32", action="store_true",
                    help="float32 (throughput mode; f64 is the default "
                         "for estimation quality)")
    ap.add_argument("--maxiter", type=int, default=1000)
    ap.add_argument("--ninit", type=int, default=8,
                    help="ensemble size (vmapped on device)")
    args = ap.parse_args()

    import jax
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import (make_ensemble_ladder,
                                        random_ensemble_inits)
    from varanneal_tpu import diag, io as vio
    from varanneal_tpu.api import make_lbfgs_options

    N_data = 41 if args.small else 161
    n_beta = 21 if args.small else 101
    dtype = np.float32 if args.f32 else np.float64
    tw = lorenz96_twin(D=20, N_data=N_data, n_obs=8)
    print(f"Lorenz-96 D=20, L=8 (Lidx={tw['Lidx']}), N={N_data}, "
          f"sigma={tw['sigma']}, beta=0..{n_beta - 1}, "
          f"ensemble B={args.ninit}")

    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"], tw["RM"],
                      disc="trapezoid", P=np.array([4.0]), pidx=[0])
    action, parts = make_action(spec)
    opts = make_lbfgs_options(dict(maxiter=args.maxiter, gtol=1e-8)
                              if dtype == np.float64
                              else dict(maxiter=args.maxiter), dtype)
    betas = jnp.arange(n_beta, dtype=dtype)
    fn = make_ensemble_ladder(action, parts, betas,
                              dtype(4e-6 * tw["RM"]), 1.5, opts=opts,
                              store_paths=True)
    xp0 = jnp.asarray(random_ensemble_inits(spec, args.ninit, seed=0,
                                            dtype=dtype))
    t0 = time.time()
    res = fn(xp0)
    jax.block_until_ready(res.A)
    t1 = time.time()

    A = np.asarray(res.A)                     # (B, n_beta)
    best, _, levels = diag.estimate_from_ensemble(A, np.asarray(res.XP))
    print(f"wall {t1 - t0:.2f}s (incl. compile) | "
          f"{int(np.asarray(res.nfev).sum())} action+grad evals | "
          f"action levels: {np.array2string(levels.levels, precision=4)} "
          f"with counts {levels.counts}")

    paths_best = np.asarray(res.paths)[best]          # (n_beta, n_dof)
    X_best = paths_best[:, : spec.n_state].reshape(n_beta, N_data, 20)
    F_est = paths_best[-1, spec.n_state]
    q = diag.path_rmse(X_best[-1], tw["traj"], Lidx=tw["Lidx"], D=20)
    print(f"best member #{best}: F = {F_est:.4f} (truth {tw['F']}) | "
          f"RMSE obs {q['observed']:.3f} / unobs {q['unobserved']:.3f} "
          f"(noise sigma {tw['sigma']})")
    print("best action ladder (every 10th beta):",
          np.array2string(A[best, ::10], precision=4))

    vio.save_paths("l96_paths.npy", X_best, spec.t_f)
    vio.save_params("l96_params.npy", paths_best[:, spec.n_state:])
    vio.save_action_errors("l96_action_errors.dat", np.arange(n_beta),
                           A[best], np.asarray(res.ME)[best],
                           np.asarray(res.FE)[best])
    diag.plot_action_levels(A, fname="l96_action_levels.png")
    print("saved l96_paths.npy / l96_params.npy / l96_action_errors.dat / "
          "l96_action_levels.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
