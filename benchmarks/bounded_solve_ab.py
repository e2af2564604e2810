"""A/B: bounded whole-solve fused Pallas kernel vs the generic bounded
solvers, on a NaKL screen-shaped config (round-4, VERDICT r3 #1 "Done"
criteria: real-TPU A/B at B=32, bounded, chunked, >=2x at identical
basin statistics).

Four arms, identical problem/inits/ladder:
  fused      — solve_pallas.make_rung_solver with box bounds
               (projection algorithm IN-KERNEL, one launch per rung)
  fused_pack — solve_pack_pallas (PACK members per grid program,
               bounded; PACK env, default 4): the round-4 packed
               kernel on the campaign shape
  projection — generic lax.while_loop solver, bounded_algo='projection'
               (the same algorithm, XLA-composed: the apples-to-apples
               speedup baseline)
  subspace   — generic full L-BFGS-B (GCP + subspace solves; the
               facade's previous bounded default and the campaigns'
               --algo subspace): the best-generic reference

Basin statistics = the per-member final-action distribution; arms are
"identical" when the sorted final actions agree to f32 ladder noise.
The result decides the solver='auto' bounded policy: the fused kernel
keeps the pick only if it is at least as fast as the best generic arm
at equal quality.

Usage (TPU testbed):
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bounded_solve_ab.py
Env knobs: B (32), NBETA (21), N (201), MAXITER (60), CHUNK (3).
N defaults to 201 — inside the kernel's measured-win gate boundary
(solve_preferred N_pad <= 256; the measured table in PARITY spans
N = 101/201 here plus the L96 small-shape variant). Full-length
N=3001/6001 campaign records stay on the generic solvers regardless:
past the win gate (the in-kernel O(N^2 D) shift matmuls) even though
the raised Mosaic budget may compile them. Writes /tmp/bounded_ab.json.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", 32))
NBETA = int(os.environ.get("NBETA", 21))
N = int(os.environ.get("N", 201))
MAXITER = int(os.environ.get("MAXITER", 60))
CHUNK = int(os.environ.get("CHUNK", 3))

STATE_BOUNDS = [(-150., 70.), (0., 1.), (0., 1.), (0., 1.)]


def main():
    from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PBOUNDS
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder
    from varanneal_tpu.api import build_bounds
    from varanneal_tpu.kernels import solve_pallas

    pidx = [1, 2, 3, 4, 5]
    tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=7, seg=max(8, N // 40))
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=pidx,
                      stim=tw["stim"])
    action, parts = make_action(spec)
    pb = [NAKL_PBOUNDS[i] for i in pidx]
    lower, upper = build_bounds(spec, STATE_BOUNDS + pb, np.float32)
    rf_dir = np.array([1.0, 1e3, 1e3, 1e3])
    rf0 = np.ascontiguousarray(np.broadcast_to(
        1e-5 * rf_dir, (spec.N_f - 1, 4))).astype(np.float32)
    betas = np.arange(NBETA, dtype=np.float32)

    # screen-style inits: data-slaved V + steady-state gates + box draws
    rng = np.random.default_rng(11)
    N_f = spec.N_f
    V_f = np.interp(np.arange(N_f) / 2.0, np.arange(N), tw["V"][:, 0])

    def a_inf(va, dva):
        return 0.5 * (1.0 + np.tanh((V_f - va) / dva))

    gss = [a_inf(NAKL_P_TRUE[7], NAKL_P_TRUE[8]),
           a_inf(NAKL_P_TRUE[11], NAKL_P_TRUE[12]),
           a_inf(NAKL_P_TRUE[15], NAKL_P_TRUE[16])]
    xps = []
    for _ in range(B):
        pe = [rng.uniform(*b) for b in pb]
        gates = [np.clip(g + rng.normal(0, 0.05, N_f), 0, 1)
                 for g in gss]
        xps.append(np.concatenate(
            [np.column_stack([V_f] + gates).ravel(), pe]).astype(
            np.float32))
    xp0 = jnp.asarray(np.stack(xps))
    lo_j, hi_j = jnp.asarray(lower), jnp.asarray(upper)

    def arm(name, opts, rung_solver=None):
        fn = jax.jit(jax.vmap(lambda z, bs: run_ladder(
            action, parts, z, bs, jnp.asarray(rf0), 1.6, opts=opts,
            lower=lo_j, upper=hi_j, store_paths=False,
            rung_solver=rung_solver), in_axes=(0, None)))
        # warm compile on the first chunk
        _ = fn(xp0, jnp.asarray(betas[:CHUNK]))
        float(np.asarray(_.A)[0, 0])     # host barrier
        xp, A_cols, nfev = xp0, [], 0
        t0 = time.perf_counter()
        for i0 in range(0, NBETA, CHUNK):
            r = fn(xp, jnp.asarray(betas[i0:i0 + CHUNK]))
            xp = r.XP
            A_cols.append(np.asarray(r.A, np.float64))
            nfev += int(np.asarray(r.nfev).sum())
        xp_h = np.asarray(xp)            # host transfer = barrier
        wall = time.perf_counter() - t0
        A = np.concatenate(A_cols, axis=1)
        res = dict(name=name, wall=float(wall), nfev=int(nfev),
                   evals_per_s=float(nfev / wall),
                   A_final_sorted=np.sort(A[:, -1]).tolist())
        print(f"{name:>10s}: {wall:7.2f}s  {nfev:8d} evals "
              f"({nfev / wall:9.0f}/s)  A_min={A[:, -1].min():.4g} "
              f"A_med={np.median(A[:, -1]):.4g}", flush=True)
        return res

    base = dict(maxiter=MAXITER, m=5, pgtol=1e-4, ftol=1e-6)
    opts_proj = LBFGSOptions(direction="two_loop",
                             bounded_algo="projection", **base)
    opts_sub = LBFGSOptions(bounded_algo="subspace", **base)

    assert solve_pallas.solve_supported(
        spec, rf0, opts_proj, bounded=True), "fused bounded unsupported?!"
    fused_solver = solve_pallas.make_rung_solver(
        spec, opts_proj, lower=lower, upper=upper)

    out = {"config": dict(B=B, NBETA=NBETA, N=N, MAXITER=MAXITER,
                          CHUNK=CHUNK, backend=jax.default_backend())}
    out["fused"] = arm("fused", opts_proj, fused_solver)
    PACK = int(os.environ.get("PACK", 4))
    from varanneal_tpu.kernels import solve_pack_pallas
    if PACK > 1 and solve_pack_pallas.pack_supported(
            spec, rf0, opts_proj, PACK, bounded=True):
        pk = solve_pack_pallas.make_packed_rung_solver(
            spec, opts_proj, PACK, lower=lower, upper=upper)
        out[f"fused_pack{PACK}"] = arm(f"fused_pack{PACK}", opts_proj,
                                       pk)
    out["projection"] = arm("projection", opts_proj)
    out["subspace"] = arm("subspace", opts_sub)

    fa = np.asarray(out["fused"]["A_final_sorted"])
    pa = np.asarray(out["projection"]["A_final_sorted"])
    out["speedup_vs_projection"] = (out["projection"]["wall"]
                                    / out["fused"]["wall"])
    out["speedup_vs_subspace"] = (out["subspace"]["wall"]
                                  / out["fused"]["wall"])
    out["basin_match_vs_projection"] = float(
        np.median(np.abs(fa - pa) / np.maximum(np.abs(pa), 1e-30)))
    print(f"speedup: {out['speedup_vs_projection']:.2f}x vs projection, "
          f"{out['speedup_vs_subspace']:.2f}x vs subspace; "
          f"median |dA|/A vs projection = "
          f"{out['basin_match_vs_projection']:.2e}")
    with open("/tmp/bounded_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote /tmp/bounded_ab.json")


if __name__ == "__main__":
    main()
