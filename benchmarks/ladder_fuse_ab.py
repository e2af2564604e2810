"""A/B: k-rung fused LADDER kernel (one launch per member for the
whole beta ladder) vs the per-rung fused solver (one launch per rung)
at the canonical bench shape (round-5, VERDICT r4 #8).

Both arms run the identical 101-rung f32 ladder (L96 D=20 N=161
trapezoid, scalar rf) from identical inits; parity = bitwise XP and
identical niter/nfev (pinned in interpret mode by
tests/test_solve_pallas.py::test_fused_ladder_kernel_matches_per_rung).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ladder_fuse_ab.py
Env: B (64), NBETA (101), MAXITER (500), REPS (3 timing reps).
Writes /tmp/ladder_fuse_ab.json.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("B", 64))
NBETA = int(os.environ.get("NBETA", 101))
MAXITER = int(os.environ.get("MAXITER", 500))
REPS = int(os.environ.get("REPS", 3))


def main():
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.parallel import random_ensemble_inits
    from varanneal_tpu.kernels import solve_pallas

    tw = lorenz96_twin(D=20, N_data=161, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"].astype(np.float32),
                      tw["t"], tw["Lidx"], tw["RM"], disc="trapezoid",
                      P=np.array([4.0]), pidx=[0])
    opts = LBFGSOptions(maxiter=MAXITER, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    action, parts = make_action(spec)
    alpha = 1.5
    rf0 = np.float32(4e-6 * tw["RM"])
    betas = jnp.arange(NBETA, dtype=jnp.float32)
    rfs = jnp.asarray(rf0 * alpha ** np.arange(NBETA,
                                               dtype=np.float32))
    xp0 = jnp.asarray(random_ensemble_inits(spec, B, seed=0,
                                            dtype=np.float32))

    solver = solve_pallas.make_rung_solver(spec, opts)
    per_rung = jax.jit(jax.vmap(lambda z: run_ladder(
        action, parts, z, betas, rf0, alpha, opts=opts,
        store_paths=False, rung_solver=solver)))
    assert solve_pallas.ladder_supported(spec, rf0, opts,
                                         n_rungs=NBETA)
    lad = solve_pallas.make_ladder_solver(spec, opts, NBETA)
    fused = jax.jit(jax.vmap(lambda z: lad(z, rfs)))

    def time_arm(fn, unpack):
        r = fn(xp0)
        xp_h = np.asarray(unpack(r)[0])      # host barrier
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = fn(xp0)
            xp_h = np.asarray(unpack(r)[0])
            walls.append(time.perf_counter() - t0)
        return min(walls), r

    w_pr, r_pr = time_arm(per_rung, lambda r: (r.XP, r))
    w_fu, r_fu = time_arm(fused, lambda r: (r[0], r))
    xp_pr = np.asarray(r_pr.XP)
    xp_fu = np.asarray(r_fu[0])
    bitwise = bool(np.array_equal(xp_pr, xp_fu))
    nfev_pr = int(np.asarray(r_pr.nfev).sum())
    nfev_fu = int(np.asarray(r_fu[1]["nfev"]).sum())
    # quality: final-rung actions, f64-evaluated at identical rf
    act64, _ = make_action(build_spec(
        lorenz96, 20, tw["Y"].astype(np.float64), tw["t"], tw["Lidx"],
        tw["RM"], disc="trapezoid", P=np.array([4.0]), pidx=[0]))
    jax.config.update("jax_enable_x64", True)
    rf_top = np.float64(rf0) * 1.5 ** float(NBETA - 1)
    a64 = jax.jit(jax.vmap(lambda z: act64(z.astype(jnp.float64),
                                           rf_top)))
    A_pr = np.asarray(a64(jnp.asarray(xp_pr)))
    A_fu = np.asarray(a64(jnp.asarray(xp_fu)))
    out = dict(B=B, NBETA=NBETA, MAXITER=MAXITER,
               backend=jax.default_backend(),
               wall_per_rung=w_pr, wall_fused_ladder=w_fu,
               speedup=w_pr / w_fu, xp_bitwise=bitwise,
               nfev_per_rung=nfev_pr, nfev_fused=nfev_fu,
               per_init_per_rung=w_pr / B, per_init_fused=w_fu / B,
               A64_final_per_rung=A_pr.tolist(),
               A64_final_fused=A_fu.tolist())
    print(f"per-rung: {w_pr:.3f}s  fused-ladder: {w_fu:.3f}s  "
          f"speedup {out['speedup']:.2f}x  XP bitwise: {bitwise}  "
          f"nfev {nfev_pr} vs {nfev_fu}  "
          f"({w_fu / B * 1e3:.2f} ms/init fused)")
    print(f"final A (f64 eval): per-rung med {np.median(A_pr):.6g} "
          f"vs fused med {np.median(A_fu):.6g}  "
          f"max rel gap {np.max(np.abs(A_fu - A_pr) / np.abs(A_pr)):.3g}")
    with open("/tmp/ladder_fuse_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote /tmp/ladder_fuse_ab.json")


if __name__ == "__main__":
    main()
