"""Canonical example (BASELINE config #1): Lorenz-96 twin experiment,
D=20, L=8 observed, trapezoid discretization, N=161, full β ladder —
the TPU-native equivalent of the reference's bundled CPU example.

Run:  python examples/lorenz96_d20.py [--small] [--f64]
Outputs: l96_paths.npy, l96_params.npy, l96_action_errors.dat
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
    args = ap.parse_args()

    import jax
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    import varanneal_tpu
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.twin import lorenz96_twin

    N_data = 41 if args.small else 161
    n_beta = 21 if args.small else 101
    tw = lorenz96_twin(D=20, N_data=N_data, n_obs=8)
    print(f"Lorenz-96 D=20, L=8 (Lidx={tw['Lidx']}), N={N_data}, "
          f"sigma={tw['sigma']}, beta=0..{n_beta - 1}")

    ann = varanneal_tpu.Annealer()
    ann.set_model(lorenz96, 20)
    ann.set_data(tw["Y"], t=tw["t"])

    rng = np.random.default_rng(0)
    X0 = rng.uniform(-10, 10, size=(N_data, 20))
    P0 = np.array([4.0])            # F estimate starts far from truth 8.17

    t0 = time.time()
    ann.anneal(X0, P0, alpha=1.5, beta_array=np.arange(n_beta),
               RM=tw["RM"], RF0=4e-6 * tw["RM"], Lidx=tw["Lidx"], Pidx=[0],
               init_to_data=True, disc="trapezoid",
               opt_args=dict(maxiter=args.maxiter, gtol=1e-8),
               verbose=True)
    t1 = time.time()

    F_est = ann.minpaths_P[-1, 0]
    X_est = ann.minpaths_X[-1]
    rmse_obs = np.sqrt(np.mean(
        (X_est[:, tw["Lidx"]] - tw["traj"][:, tw["Lidx"]]) ** 2))
    unobs = [i for i in range(20) if i not in tw["Lidx"]]
    rmse_unobs = np.sqrt(np.mean(
        (X_est[:, unobs] - tw["traj"][:, unobs]) ** 2))
    print(f"wall {t1 - t0:.2f}s | F = {F_est:.4f} (truth {tw['F']}) | "
          f"RMSE obs {rmse_obs:.3f} / unobs {rmse_unobs:.3f} "
          f"(noise sigma {tw['sigma']})")
    print("action levels (every 10th beta):",
          np.array2string(ann.A_array[::10], precision=4))

    ann.save_paths("l96_paths.npy")
    ann.save_params("l96_params.npy")
    ann.save_action_errors("l96_action_errors.dat")
    print("saved l96_paths.npy / l96_params.npy / l96_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
