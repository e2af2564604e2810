"""NaKL ensemble estimation — the full VA methodology for config #3.

Round-1 experiments showed the NaKL voltage-only inverse problem has a
near-degenerate conductance/reversal manifold: single inits land in
compensated basins with perfect V tracking but wrong parameters. The
working recipe (this script):

1. bipolar injected current (probes the I-V curve across a wide V range);
2. an f32 ensemble of random gate/parameter initializations, annealed on
   device with CHUNKED dispatches (long single dispatches crash some TPU
   runtimes — and chunking also bounds preemption loss);
3. f64 polish of the lowest-action members (deep inner solves).

Run:  python examples/nakl_ensemble.py [--small] [--ninit B] [--chunk K]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--ninit", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--maxiter", type=int, default=400)
    ap.add_argument("--polish-maxiter", type=int, default=4000)
    ap.add_argument("--no-polish", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)   # phase 2 needs f64; the
    # phase-1 ensemble stays f32 via explicit array dtypes
    import jax.numpy as jnp
    from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PNAMES
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.api import build_bounds
    from varanneal_tpu import diag

    N = 751 if args.small else 3001
    n_beta = 41 if args.small else 61
    dt = 0.04
    tw = nakl_twin(N=N, dt=dt, sigma=1.0, seed=7, seg=75,
                   i_min=-25.0, i_max=60.0)
    traj, V, stim, t = tw["traj"], tw["V"], tw["stim"], tw["t"]
    print(f"NaKL ensemble: N={N}, B={args.ninit}, "
          f"{int((np.diff(np.sign(traj[:, 0] + 20)) > 0).sum())} spikes, "
          f"bipolar drive")

    Pidx = [1, 2, 3, 4, 5]
    bounds = [(-150., 70.), (0., 1.), (0., 1.), (0., 1.),
              (50., 200.), (20., 80.), (5., 60.), (-100., -50.),
              (0.05, 1.0)]

    def make_problem(dtype):
        spec = build_spec(nakl, 4, V.astype(dtype), t, [0], 1.0,
                          disc="SimpsonHermite",
                          P=np.asarray(NAKL_P_TRUE), pidx=Pidx, stim=stim)
        action, parts = make_action(spec)
        lo, hi = build_bounds(spec, bounds, dtype)
        return spec, action, parts, lo, hi

    # ---- phase 1: f32 ensemble, chunked --------------------------------
    spec, action, parts, lo, hi = make_problem(np.float32)
    rng = np.random.default_rng(3)
    N_f = spec.N_f
    V_f = np.interp(np.arange(N_f) / 2.0, np.arange(N), V[:, 0])
    xp0s = []
    for _ in range(args.ninit):
        X0 = np.column_stack([V_f] + [rng.uniform(0, 1, N_f)
                                      for _ in range(3)])
        pe = [rng.uniform(*bounds[4 + j]) for j in range(5)]
        xp0s.append(np.concatenate([X0.ravel(), pe]).astype(np.float32))
    xp = jnp.asarray(np.stack(xp0s))

    opts = LBFGSOptions(maxiter=args.maxiter, m=5, pgtol=1e-4, ftol=1e-6)
    betas_all = np.arange(n_beta, dtype=np.float32)
    lad = jax.jit(jax.vmap(
        lambda z, bc: run_ladder(action, parts, z, bc, np.float32(1e-5),
                                 1.6, lower=lo, upper=hi, opts=opts,
                                 store_paths=False), in_axes=(0, None)))
    t0 = time.time()
    A_parts = []
    for i0 in range(0, n_beta, args.chunk):
        r = lad(xp, jnp.asarray(betas_all[i0: i0 + args.chunk]))
        jax.block_until_ready(r.A)
        xp = r.XP
        A_parts.append(np.asarray(r.A))
    A = np.concatenate(A_parts, axis=1)
    print(f"phase-1 ensemble: {time.time() - t0:.1f}s "
          f"(incl. compile)")
    lv = diag.action_levels(A[:, -1], rel_gap=0.02)
    print("action levels:", np.array2string(lv.levels[:5], precision=1),
          "counts:", lv.counts[:5])

    best = int(lv.best_members[0])
    XPb = np.asarray(xp)[best].astype(np.float64)

    # ---- phase 2: f64 polish of the best member ------------------------
    if not args.no_polish:
        spec64, action64, parts64, lo64, hi64 = make_problem(np.float64)
        opts64 = LBFGSOptions(maxiter=args.polish_maxiter, pgtol=1e-10,
                              ftol=1e-14)
        pol = jax.jit(lambda z, b: run_ladder(
            action64, parts64, z, b, 1e-5, 1.6, lower=lo64, upper=hi64,
            opts=opts64, store_paths=False))
        t1 = time.time()
        res = pol(jnp.asarray(XPb),
                  jnp.arange(float(n_beta - 21), float(n_beta + 10)))
        jax.block_until_ready(res.A)
        print(f"phase-2 polish: {time.time() - t1:.1f}s")
        XPb = np.asarray(res.XP)

    p_est = XPb[spec.n_state:]
    print("estimated vs truth:")
    for j, pi in enumerate(Pidx):
        print(f"  {NAKL_PNAMES[pi]:>4}: est {p_est[j]:9.4f}   "
              f"truth {NAKL_P_TRUE[pi]:9.4f}")
    V_est = XPb[: spec.n_state].reshape(spec.N_f, 4)[::2, 0]
    print(f"V RMSE vs truth: "
          f"{np.sqrt(np.mean((V_est - traj[:, 0]) ** 2)):.3f} mV")
    return 0


if __name__ == "__main__":
    sys.exit(main())
