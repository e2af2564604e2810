"""BASELINE config #3: NaKL Hodgkin–Huxley neuron — joint state+parameter
estimation from voltage-only data, driven by an injected-current stimulus,
with box bounds on gates and conductances.

Run:  python examples/nakl.py [--small]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--maxiter", type=int, default=5000)
    ap.add_argument("--bipolar", action="store_true",
                    help="bipolar injected current (-25..+60): probes the "
                         "I-V curve over a wider V range, improving "
                         "conductance identifiability")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)

    import varanneal_tpu
    from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PNAMES
    from varanneal_tpu.twin import nakl_twin

    dt = 0.04            # ms
    N = 751 if args.small else 3001     # 30 ms / 120 ms windows
    n_beta = 40 if args.small else 81
    if args.bipolar:
        tw = nakl_twin(N=N, dt=dt, sigma=1.0, seed=7, seg=75,
                       i_min=-25.0, i_max=60.0)
    else:
        tw = nakl_twin(N=N, dt=dt, sigma=1.0, seed=7)
    traj, V_data, stim, t = tw["traj"], tw["V"], tw["stim"], tw["t"]
    sigma = tw["sigma"]
    print(f"NaKL: N={N}, dt={dt} ms, V-only data (sigma={sigma} mV), "
          f"{int((np.diff(np.sign(traj[:, 0] + 20)) > 0).sum())} spikes")

    ann = varanneal_tpu.Annealer()
    ann.set_model(nakl, 4)
    ann.set_data(V_data, stim=stim, t=t)

    # estimate maximal conductances + reversal potentials (5 params);
    # kinetics held at truth (the standard first NaKL experiment)
    Pidx = [1, 2, 3, 4, 5]       # gNa, ENa, gK, EK, gL
    P0 = np.asarray(NAKL_P_TRUE, float).copy()
    P0[Pidx] = [80.0, 40.0, 30.0, -60.0, 0.5]     # wrong starting guesses

    X0 = np.column_stack([V_data[:, 0], np.full(N, 0.5),
                          np.full(N, 0.5), np.full(N, 0.5)])
    bounds = [(-150.0, 70.0), (0.0, 1.0), (0.0, 1.0), (0.0, 1.0),
              (50.0, 200.0), (20.0, 80.0), (5.0, 60.0), (-100.0, -50.0),
              (0.05, 1.0)]

    t0 = time.time()
    ann.anneal(X0, P0, alpha=1.6, beta_array=np.arange(n_beta),
               RM=1.0 / sigma ** 2, RF0=1e-5, Lidx=[0], Pidx=Pidx,
               disc="SimpsonHermite", bounds=bounds,
               opt_args=dict(maxiter=args.maxiter), verbose=True)
    t1 = time.time()

    p_est = ann.minpaths_P[-1]
    print(f"wall {t1 - t0:.2f}s")
    for j, pi in enumerate(Pidx):
        print(f"  {NAKL_PNAMES[pi]:>4}: est {p_est[j]:9.4f}   "
              f"truth {NAKL_P_TRUE[pi]:9.4f}")
    V_est = ann.minpaths_X[-1][::2, 0]   # even points of the doubled grid
    print(f"  V RMSE vs truth: "
          f"{np.sqrt(np.mean((V_est - traj[:, 0]) ** 2)):.3f} mV "
          f"(noise {sigma})")
    ann.save_paths("nakl_paths.npy")
    ann.save_action_errors("nakl_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
