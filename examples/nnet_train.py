"""BASELINE config #4: feedforward-network weight estimation as variational
annealing over layer-to-layer dynamics (the va_nnet path).

Run:  python examples/nnet_train.py [--small]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="float32 throughput mode (f64 is the default "
                         "for estimation quality; on this TPU f64 is "
                         "emulated ~44x slower — CLAUDE.md)")
    args = ap.parse_args()

    import jax
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    from varanneal_tpu import nnet

    rng = np.random.default_rng(11)
    M = 32 if args.small else 128
    n_beta = 16 if args.small else 31
    # teacher: smooth 2->1 map
    U = rng.uniform(-1, 1, size=(M, 2))
    Y = (np.sin(2.0 * U[:, :1]) * np.cos(1.5 * U[:, 1:])
         + 0.25 * U[:, :1] * U[:, 1:])

    ann = nnet.Annealer()
    ann.set_structure([2, 16, 16, 1])
    ann.set_activation("tanh")
    ann.set_input_data(U)
    ann.set_output_data(Y)

    opt_args = (dict(maxiter=1500) if args.f32
                else dict(maxiter=1500, gtol=1e-9))
    t0 = time.time()
    ann.anneal(alpha=2.0, beta_array=np.arange(n_beta), RM=1.0, RF0=1e-3,
               opt_args=opt_args, seed=3)
    t1 = time.time()

    pred = ann.predict(U)
    rmse_train = np.sqrt(np.mean((pred - Y) ** 2))
    U_test = rng.uniform(-1, 1, size=(256, 2))
    Y_test = (np.sin(2.0 * U_test[:, :1]) * np.cos(1.5 * U_test[:, 1:])
              + 0.25 * U_test[:, :1] * U_test[:, 1:])
    rmse_test = np.sqrt(np.mean((ann.predict(U_test) - Y_test) ** 2))
    print(f"wall {t1 - t0:.2f}s | train RMSE {rmse_train:.4f} | "
          f"test RMSE {rmse_test:.4f}")
    print("action ladder (every 5th beta):",
          np.array2string(ann.A_array[::5], precision=5))
    ann.save_action_errors("nnet_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
