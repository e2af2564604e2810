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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dims", type=int, nargs="*",
                    default=[20, 128, 256, 400])
    ap.add_argument("--block", type=int, default=64,
                    help="kernel time-block rows (VMEM scales with "
                         "batch x block under vmap)")
    ap.add_argument("--nakl", action="store_true",
                    help="also A/B the NaKL SimpsonHermite config")
    ap.add_argument("--ladder", action="store_true",
                    help="also time a real 3-beta mini-ladder per variant")
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
        a_x, p_x = make_action(spec)
        a_p, p_p = make_action_pallas(spec, block_n=args.block)
        a_pf, p_pf = make_action_pallas(spec, block_n=args.block,
                                        pallas_backward=False)
        rng = np.random.default_rng(0)
        xp = jnp.asarray(rng.normal(size=(B, n_dof)).astype(np.float32))
        rf = jnp.float32(1e-3)
        variants = {"xla": a_x, "pallas": a_p, "pallas-fwd": a_pf}
        for mode in ("fwd", "fwd+bwd"):
            ts = {}
            for name, a in variants.items():
                if mode == "fwd" and name == "pallas-fwd":
                    continue
                f = (jax.vmap(a, in_axes=(0, None)) if mode == "fwd"
                     else jax.vmap(jax.value_and_grad(a),
                                   in_axes=(0, None)))
                ts[name] = bench_one(jax.jit(f), (xp, rf), iters)
            row = " ".join(f"{n}={t * 1e3:.3f}ms" for n, t in ts.items())
            sp = ts["xla"] / min(t for n, t in ts.items() if n != "xla")
            print(f"{tag:>24} {mode:>8}  {row}  best-pallas {sp:.2f}x",
                  flush=True)
        if args.ladder:
            from varanneal_tpu.opt import LBFGSOptions
            from varanneal_tpu.anneal import run_ladder
            opts = LBFGSOptions(maxiter=100, m=5, pgtol=1e-4, ftol=1e-6)
            betas = jnp.arange(3.0, dtype=jnp.float32)
            for name, (a, p) in {"xla": (a_x, p_x), "pallas": (a_p, p_p),
                                 "pallas-fwd": (a_pf, p_pf)}.items():
                lad = jax.jit(jax.vmap(
                    lambda z, bc, a=a, p=p: run_ladder(
                        a, p, z, bc, np.float32(1e-4), 1.5, opts=opts,
                        store_paths=False), in_axes=(0, None)))
                out = lad(xp, betas)
                jax.block_until_ready(out.A)
                t0 = time.perf_counter()
                out = lad(xp, betas)
                jax.block_until_ready(out.A)
                dt_l = time.perf_counter() - t0
                print(f"{tag:>24} {'ladder':>8}  {name}={dt_l * 1e3:.1f}ms"
                      f"  (nfev={int(np.asarray(out.nfev).sum())})",
                      flush=True)

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
