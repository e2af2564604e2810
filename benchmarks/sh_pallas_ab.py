"""A/B: XLA vs Pallas(batched-grid) SH action+grad through a real vmapped
mini-ladder at the SH BASELINE shapes (VERDICT r02 next-round #4
done-criterion): NaKL config #3 (D=4 — lane padding 4->128 is a 32x
traffic amplifier, the structural reason Pallas cannot win there) and
L96-SH config #2 (D=100 — padding 1.28x, the fair test of the
batched-grid layout). Run on TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sh_pallas_ab.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def run_case(name, spec, rf0, B, maxiter, block):
    from varanneal_tpu.kernels.fe_pallas import select_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder

    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(
        rng.normal(size=(B, spec.n_dof)).astype(np.float32))
    # mid-ladder rungs where the inner solver is maxiter-bound (a
    # representative production load, not the few-iteration easy rungs)
    opts = LBFGSOptions(maxiter=maxiter, m=5, pgtol=1e-12, ftol=1e-14)
    betas = jnp.arange(18.0, 20.0, dtype=jnp.float32)
    reps = 3
    for engine in ("xla", "pallas"):
        act, parts = select_action(spec, rf0, engine=engine,
                                   dtype=np.float32, block_n=block)
        lad = jax.jit(jax.vmap(
            lambda z, b: run_ladder(act, parts, z, b, jnp.asarray(rf0),
                                    1.6, opts=opts, store_paths=False),
            in_axes=(0, None)))
        r = lad(xp0, betas)          # compile + warm
        np.asarray(r.A)              # host transfer = the real barrier
        # (block_until_ready alone returns early through this testbed's
        # tunneled PJRT plugin — measured)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = lad(xp0, betas)
            np.asarray(r.A)
        dt = (time.perf_counter() - t0) / reps
        nfev = int(np.asarray(r.nfev).sum())
        print(f"{name:12s} {engine:7s} block={block} B={B}: {dt:.3f} s, "
              f"nfev={nfev}, {nfev / dt:,.0f} member-evals/s, "
              f"A_last_min={float(np.asarray(r.A)[:, -1].min()):.5g}",
              flush=True)


def main():
    from varanneal_tpu.models import nakl, NAKL_P_TRUE, lorenz96
    from varanneal_tpu.twin import nakl_twin, lorenz96_twin
    from varanneal_tpu.ops import build_spec

    N = int(os.environ.get("AB_N", "3001"))
    B = int(os.environ.get("AB_B", "64"))
    maxiter = int(os.environ.get("AB_MAXITER", "60"))
    block = int(os.environ.get("AB_BLOCK", "256"))

    # config #2: L96 D=100 Hermite-Simpson (padding-benign SH case)
    tw2 = lorenz96_twin(D=100, N_data=161, n_obs=40)
    spec2 = build_spec(lorenz96, 100, tw2["Y"].astype(np.float32),
                       tw2["t"], tw2["Lidx"], tw2["RM"],
                       disc="SimpsonHermite", P=np.array([8.17]),
                       pidx=[0])
    run_case("L96-D100-SH", spec2, np.float32(4e-6 * tw2["RM"]),
             B, maxiter, block)

    # config #3: NaKL (D=4; the padding-dominated case)
    tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=7, seg=75,
                   i_min=-25.0, i_max=60.0)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 2, 3, 4, 5],
                      stim=tw["stim"])
    rf_dir = np.array([1.0, 1000.0, 1000.0, 1000.0])
    rf0 = np.ascontiguousarray(np.broadcast_to(
        1e-5 * rf_dir, (spec.N_f - 1, 4))).astype(np.float32)
    run_case("NaKL-SH", spec, rf0, B, maxiter, block)


if __name__ == "__main__":
    main()
