"""A/B benchmark: fused Pallas FE kernel vs XLA's own fusion.

The VERDICT-mandated measurement (round 1 showed the kernel LOSING at
D=20 where 20->128 lane padding dominates): time forward-only and
forward+backward action evaluations at several state dimensions and pick
a data-driven policy for when the kernel should be preferred.

Run on the TPU:  python benchmarks/pallas_ab.py [--quick]
Results are recorded in PARITY.md's performance table.
"""

import argparse
import sys
import time

import numpy as np


def bench_one(fn, args_, iters):
    import jax
    out = fn(*args_)                    # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args_)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dims", type=int, nargs="*",
                    default=[20, 128, 256, 400])
    ap.add_argument("--nakl", action="store_true",
                    help="also A/B the NaKL SimpsonHermite config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from varanneal_tpu.twin import lorenz96_twin, nakl_twin
    from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.kernels.fe_pallas import (
        make_action_pallas, fe_supported)

    B = args.batch
    iters = 10 if args.quick else args.iters
    print(f"device={jax.devices()[0].platform}  batch={B}  iters={iters}")
    print(f"{'config':>24} {'mode':>8} {'xla ms':>9} {'pallas ms':>10} "
          f"{'speedup':>8}")

    def ab(tag, spec, n_dof):
        a_x, _ = make_action(spec)
        a_p, _ = make_action_pallas(spec)
        rng = np.random.default_rng(0)
        xp = jnp.asarray(rng.normal(size=(B, n_dof)).astype(np.float32))
        rf = jnp.float32(1e-3)
        for mode in ("fwd", "fwd+bwd"):
            if mode == "fwd":
                f_x = jax.jit(jax.vmap(a_x, in_axes=(0, None)))
                f_p = jax.jit(jax.vmap(a_p, in_axes=(0, None)))
            else:
                f_x = jax.jit(jax.vmap(jax.value_and_grad(a_x),
                                       in_axes=(0, None)))
                f_p = jax.jit(jax.vmap(jax.value_and_grad(a_p),
                                       in_axes=(0, None)))
            t_x = bench_one(f_x, (xp, rf), iters)
            t_p = bench_one(f_p, (xp, rf), iters)
            print(f"{tag:>24} {mode:>8} {t_x * 1e3:9.3f} {t_p * 1e3:10.3f} "
                  f"{t_x / t_p:8.2f}x", flush=True)

    for D in args.dims:
        tw = lorenz96_twin(D=D, N_data=161, n_obs=max(1, D * 2 // 5))
        spec = build_spec(lorenz96, D, tw["Y"], tw["t"], tw["Lidx"],
                          tw["RM"], disc="trapezoid", P=np.array([4.0]),
                          pidx=[0])
        assert fe_supported(spec, 1e-3)
        ab(f"L96 D={D} trapezoid", spec, spec.n_dof)

    if args.nakl:
        tw = nakl_twin(N=3001, dt=0.04, sigma=1.0, seed=7, seg=75)
        spec = build_spec(nakl, 4, tw["V"], tw["t"], [0], 1.0,
                          disc="SimpsonHermite",
                          P=np.asarray(NAKL_P_TRUE), pidx=[1, 2, 3, 4, 5],
                          stim=tw["stim"])
        assert fe_supported(spec, 1e-3)
        ab("NaKL N=3001 SH+stim", spec, spec.n_dof)
    return 0


if __name__ == "__main__":
    sys.exit(main())
