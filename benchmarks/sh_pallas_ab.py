"""A/B: XLA vs Pallas(batched-grid) SH action+grad through a real vmapped
mini-ladder at the NaKL config #3 shape (VERDICT r02 next-round #4
done-criterion). Run on TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sh_pallas_ab.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from varanneal_tpu.models import nakl, NAKL_P_TRUE
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.ops import build_spec
    from varanneal_tpu.kernels.fe_pallas import select_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal import run_ladder

    N = int(os.environ.get("AB_N", "3001"))
    B = int(os.environ.get("AB_B", "64"))
    maxiter = int(os.environ.get("AB_MAXITER", "60"))
    block = int(os.environ.get("AB_BLOCK", "256"))
    tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=7, seg=75,
                   i_min=-25.0, i_max=60.0)
    spec = build_spec(nakl, 4, tw["V"].astype(np.float32), tw["t"], [0],
                      1.0, disc="SimpsonHermite",
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 2, 3, 4, 5],
                      stim=tw["stim"])
    rf_dir = np.array([1.0, 1000.0, 1000.0, 1000.0])
    rf0 = np.ascontiguousarray(np.broadcast_to(
        1e-5 * rf_dir, (spec.N_f - 1, 4))).astype(np.float32)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(
        rng.normal(size=(B, spec.n_dof)).astype(np.float32))
    opts = LBFGSOptions(maxiter=maxiter, m=5, pgtol=1e-4, ftol=1e-6)
    betas = jnp.arange(3.0, dtype=jnp.float32)
    for engine in ("xla", "pallas"):
        act, parts = select_action(spec, rf0, engine=engine,
                                   dtype=np.float32, block_n=block)
        lad = jax.jit(jax.vmap(
            lambda z, b: run_ladder(act, parts, z, b, jnp.asarray(rf0),
                                    1.6, opts=opts, store_paths=False),
            in_axes=(0, None)))
        r = lad(xp0, betas)          # compile + warm
        jax.block_until_ready(r.A)
        t0 = time.perf_counter()
        r = lad(xp0, betas)
        jax.block_until_ready(r.A)
        dt = time.perf_counter() - t0
        nfev = int(np.asarray(r.nfev).sum())
        print(f"{engine:7s} block={block} B={B} N={N}: {dt:.3f} s, "
              f"nfev={nfev}, {nfev / dt:,.0f} member-evals/s, "
              f"A_last_min={float(np.asarray(r.A)[:, -1].min()):.5g}",
              flush=True)


if __name__ == "__main__":
    main()
