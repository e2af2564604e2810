"""Measured f32-vs-f64 quality gap on the canonical 101-β ladder
(VERDICT r1 #3; results table in PARITY.md).

Runs the Lorenz-96 D=20/N=161 ladder three ways — f64, f32, and the
two-phase f32-ladder + f64-tail recipe — and reports final action,
parameter error, and path RMSE against the twin-experiment truth.

Run:  JAX_ENABLE_X64=1 python benchmarks/dtype_gap.py [--tail K]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tail", type=int, default=10)
    ap.add_argument("--nbeta", type=int, default=101)
    ap.add_argument("--maxiter", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder

    tw = lorenz96_twin(D=20, N_data=161, n_obs=8)
    truth, F_true = tw["traj"], tw["F"]
    betas = np.arange(args.nbeta)
    rng = np.random.default_rng(0)
    X0 = rng.uniform(-5, 5, size=(161, 20))
    unobs = [i for i in range(20) if i not in tw["Lidx"]]

    def run(dtype, maxiter, xp_init=None, beta_arr=betas, label=""):
        spec = build_spec(lorenz96, 20, tw["Y"].astype(dtype), tw["t"],
                          tw["Lidx"], tw["RM"], disc="trapezoid",
                          P=np.array([4.0]), pidx=[0])
        action, parts = make_action(spec)
        if xp_init is None:
            X0c = X0.copy()
            X0c[:, np.asarray(tw["Lidx"])] = tw["Y"]
            xp0 = np.concatenate([X0c.ravel(), [4.0]]).astype(dtype)
        else:
            xp0 = np.asarray(xp_init, dtype)
        if dtype == np.float64:
            opts = LBFGSOptions(maxiter=maxiter, pgtol=1e-8, ftol=2.22e-9)
        else:
            opts = LBFGSOptions(maxiter=maxiter, pgtol=1e-4, ftol=1e-6)
        t0 = time.time()
        r = jax.jit(lambda z, b: run_ladder(
            action, parts, z, b, dtype(1.6e-5), dtype(1.5), opts=opts,
            store_paths=False))(jnp.asarray(xp0),
                                jnp.asarray(beta_arr, dtype))
        jax.block_until_ready(r.A)
        XP = np.asarray(r.XP, np.float64)
        X = XP[:-1].reshape(161, 20)
        print(f"{label}: wall={time.time() - t0:.1f}s  "
              f"A_final={float(np.asarray(r.A)[-1]):.8g}  "
              f"F_est={XP[-1]:.6f} "
              f"(err {abs(XP[-1] - F_true) / F_true * 100:.3f}%)  "
              f"RMSE_obs={np.sqrt(np.mean((X[:, tw['Lidx']] - truth[:, tw['Lidx']]) ** 2)):.5f}  "
              f"RMSE_unobs={np.sqrt(np.mean((X[:, unobs] - truth[:, unobs]) ** 2)):.5f}  "
              f"nfev={int(np.asarray(r.nfev).sum())}", flush=True)
        return XP

    run(np.float64, args.maxiter, label="f64 ladder      ")
    xp32 = run(np.float32, args.maxiter, label="f32 ladder      ")
    run(np.float64, 4 * args.maxiter, xp_init=xp32,
        beta_arr=betas[-args.tail:], label=f"f32+f64 tail({args.tail})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
