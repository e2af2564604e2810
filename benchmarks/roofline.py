"""Roofline accounting for the hot op — one fused action+grad evaluation —
at the BASELINE configs (VERDICT r02 next-round #5).

Counts FLOPs and minimal HBM bytes analytically from the problem shape,
measures achieved member-evals/s on the current backend via timed batched
evaluation loops (pure action+grad, no optimizer, and a full mini-ladder
for the production per-eval number), and reports % of the HBM roofline
and % of f32 compute peak. v5e-lite single-core reference numbers:
HBM ~819 GB/s, f32 VPU ~3.6 TFLOP/s (bf16 MXU peak is irrelevant here —
the op has no matmuls).

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/roofline.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

HBM_GBS = float(os.environ.get("ROOF_HBM_GBS", "819"))
F32_TFLOPS = float(os.environ.get("ROOF_F32_TFLOPS", "3.6"))

# analytic per-element costs (flops per state-plane element per fused
# action+grad): f eval + residual + quadratic + adjoint; see PARITY.md
FLOPS_PER_ELT = {"trapezoid": 30.0, "SimpsonHermite": 45.0}
# minimal HBM traffic per eval: read X, write grad (f32); intermediate
# residual/f arrays assumed fused (the Pallas kernel guarantees this;
# XLA mostly fuses them too)
BYTES_PER_ELT = 8.0


def bench_eval(action, n_dof, B, dtype=np.float32, iters=30):
    vag = jax.jit(jax.vmap(jax.value_and_grad(
        lambda z: action(z, jnp.asarray(np.float32(1e-2))))))
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(B, n_dof)).astype(dtype))
    out = vag(xp)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = vag(xp)
    jax.block_until_ready((v, g))
    dt = (time.perf_counter() - t0) / iters
    return dt


def report(name, spec, action, B):
    n_elt = spec.N_f * spec.D
    flops = FLOPS_PER_ELT[spec.disc] * n_elt
    bytes_ = BYTES_PER_ELT * n_elt
    dt = bench_eval(action, spec.n_dof, B)
    per_member = dt / B
    achieved_gbs = bytes_ * B / dt / 1e9
    achieved_tflops = flops * B / dt / 1e12
    t_mem = bytes_ * B / (HBM_GBS * 1e9)
    t_cmp = flops * B / (F32_TFLOPS * 1e12)
    bound = "HBM" if t_mem > t_cmp else "compute"
    floor = max(t_mem, t_cmp)
    print(f"{name:24s} B={B:5d} n_elt={n_elt:8d}  {per_member*1e6:9.2f} "
          f"us/member-eval  {achieved_gbs:7.2f} GB/s "
          f"({100*achieved_gbs/HBM_GBS:5.2f}% HBM)  "
          f"{achieved_tflops*1000:8.2f} GFLOP/s "
          f"({100*achieved_tflops/F32_TFLOPS:5.2f}% f32)  "
          f"roofline-floor({bound})={floor*1e6:.1f} us -> "
          f"{100*floor/dt:5.1f}% of floor", flush=True)


def main():
    from varanneal_tpu.models import lorenz96, nakl, NAKL_P_TRUE
    from varanneal_tpu.twin import lorenz96_twin, nakl_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.kernels.fe_pallas import make_action_pallas

    print(f"backend={jax.devices()[0].platform}  HBM={HBM_GBS} GB/s  "
          f"f32 peak={F32_TFLOPS} TFLOP/s")
    # config #1: D=20 trapezoid
    tw = lorenz96_twin(D=20, N_data=161, n_obs=8)
    s20 = build_spec(lorenz96, 20, tw["Y"].astype(np.float32), tw["t"],
                     tw["Lidx"], tw["RM"], disc="trapezoid",
                     P=np.array([4.0]), pidx=[0])
    a20, _ = make_action(s20)
    for B in (1, 256):
        report("L96 D=20 trap XLA", s20, a20, B)
    # config #4: D=400 trapezoid, XLA and Pallas
    tw4 = lorenz96_twin(D=400, N_data=161, n_obs=160)
    s400 = build_spec(lorenz96, 400, tw4["Y"].astype(np.float32),
                      tw4["t"], tw4["Lidx"], tw4["RM"], disc="trapezoid",
                      P=np.array([4.0]), pidx=[0])
    a400, _ = make_action(s400)
    for B in (1, 64):
        report("L96 D=400 trap XLA", s400, a400, B)
    a400p, _ = make_action_pallas(s400, block_n=64)
    for B in (1, 64):
        report("L96 D=400 trap Pallas", s400, a400p, B)
    # config #3: NaKL SH, XLA and Pallas(batched grid)
    twn = nakl_twin(N=3001, dt=0.04, sigma=1.0, seed=7, seg=75,
                    i_min=-25.0, i_max=60.0)
    sn = build_spec(nakl, 4, twn["V"].astype(np.float32), twn["t"], [0],
                    1.0, disc="SimpsonHermite", P=np.asarray(NAKL_P_TRUE),
                    pidx=[1, 2, 3, 4, 5], stim=twn["stim"])
    an, _ = make_action(sn)
    for B in (1, 64):
        report("NaKL SH XLA", sn, an, B)
    anp, _ = make_action_pallas(sn, block_n=256)
    for B in (1, 64):
        report("NaKL SH Pallas", sn, anp, B)


if __name__ == "__main__":
    main()
