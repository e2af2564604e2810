"""BASELINE config #2: Lorenz-96 D=100 with Hermite–Simpson collocation and
sparse/noisy observations (20 of 100 components observed, sigma=1.0).

Run:  python examples/lorenz96_d100_sh.py [--small]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--maxiter", type=int, default=800)
    ap.add_argument("--ckpt", type=str, default="l96_d100_ckpt.npz",
                    help="checkpoint path; chunks the ladder into short "
                         "resumable device dispatches (some TPU runtimes "
                         "kill single dispatches over ~60 s) — '' disables")
    ap.add_argument("--ckpt-every", type=int, default=2)
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
    # compare on the data grid (even points of the doubled grid)
    X_est = ann.minpaths_X[-1][::2]
    rmse = np.sqrt(np.mean((X_est[:, tw["Lidx"]]
                            - tw["traj"][:, tw["Lidx"]]) ** 2))
    print(f"wall {t1 - t0:.2f}s | F = {F_est:.4f} (truth {tw['F']}) | "
          f"RMSE observed {rmse:.3f} (noise {tw['sigma']})")
    ann.save_action_errors("l96_d100_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
