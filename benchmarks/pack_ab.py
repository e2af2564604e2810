"""A/B: packed-member whole-solve kernel vs the k=1 kernel (round-4,
VERDICT r3 #7 — attack the small-D serialization headroom by packing k
members per grid program so their independent eval chains overlap in
the instruction stream).

Canonical bench ladder (L96 D=20 trapezoid N=161, 101 rungs, maxiter
150 + repeats-style chunking NOT needed here: one jitted ladder at
maxiter 500 matches bench.py) at B members, pack in {1, 2, 4, 8}.
Reports s/init per pack plus eval counts (packs pay their slowest
member, so total nfev may rise slightly with k — the lockstep cost the
wall-clock number already includes).

Usage (TPU): PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/pack_ab.py
Env: B (64), NBETA (101), MAXITER (150). Writes /tmp/pack_ab.json.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", 64))
NBETA = int(os.environ.get("NBETA", 101))
MAXITER = int(os.environ.get("MAXITER", 150))
# pack 4 is within the raised analytic budget (round-4 vmem policy);
# the cached compile probe confirms each pack shape on hardware.
# Measured result (PARITY round-4): packing LOSES monotonically
# (0.53x/0.38x at pack 2/3) — this tool documents the negative.
PACKS = [int(p) for p in
         os.environ.get("PACKS", "1,2,3,4").split(",")]


def main():
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.parallel import (make_ensemble_ladder,
                                        random_ensemble_inits)
    from varanneal_tpu.kernels import solve_pallas, solve_pack_pallas

    tw = lorenz96_twin(D=20, N_data=161, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc="trapezoid", P=np.array([4.0]),
                      pidx=[0])
    action, parts = make_action(spec)
    betas = jnp.arange(NBETA, dtype=jnp.float32)
    rf0 = np.float32(4e-6 * tw["RM"])
    opts = LBFGSOptions(maxiter=MAXITER, pgtol=1e-4, ftol=1e-6, m=5,
                        maxls=20)
    xp0 = jnp.asarray(random_ensemble_inits(spec, B, seed=3,
                                            dtype=np.float32))

    out = {"config": dict(B=B, NBETA=NBETA, MAXITER=MAXITER,
                          backend=jax.default_backend())}
    for pack in PACKS:
        if pack == 1:
            solver = solve_pallas.make_rung_solver(spec, opts)
        else:
            if not solve_pack_pallas.pack_supported(
                    spec, rf0, opts, pack):
                print(f"pack={pack}: unsupported (VMEM); skipped")
                continue
            solver = solve_pack_pallas.make_packed_rung_solver(
                spec, opts, pack)
        fn = make_ensemble_ladder(action, parts, betas, rf0, 1.5,
                                  opts=opts, store_paths=False,
                                  rung_solver=solver)
        r = fn(xp0)
        float(np.asarray(r.A)[0, -1])          # warm + host barrier
        t0 = time.perf_counter()
        r = fn(xp0)
        a_last = np.asarray(r.A)               # host transfer barrier
        wall = time.perf_counter() - t0
        nfev = int(np.asarray(r.nfev).sum())
        out[f"pack{pack}"] = dict(
            wall=float(wall), s_per_init=float(wall / B), nfev=nfev,
            evals_per_s=float(nfev / wall),
            A_med=float(np.median(a_last[:, -1])))
        print(f"pack={pack}: {wall:7.2f}s total, "
              f"{wall / B * 1e3:7.2f} ms/init, {nfev:8d} evals "
              f"({nfev / wall:9.0f}/s), A_med={out[f'pack{pack}']['A_med']:.6g}",
              flush=True)
    if "pack1" in out:
        base = out["pack1"]["wall"]
        for pack in PACKS[1:]:
            if f"pack{pack}" in out:
                out[f"speedup_pack{pack}"] = base / out[f"pack{pack}"]["wall"]
                print(f"speedup pack{pack} vs pack1: "
                      f"{out[f'speedup_pack{pack}']:.2f}x")
    with open("/tmp/pack_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote /tmp/pack_ab.json")


if __name__ == "__main__":
    main()
