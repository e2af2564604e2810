"""Real-TPU Mosaic compile + correctness probe for the whole-solve
kernel (kernels/solve_pallas.py). Small L96 problem, one solve, compared
against the XLA solver on the same device. Exercises the kernel's
unproven-on-Mosaic patterns (dynamic leading-index scratch, nested
while_loop, in-kernel cond around a vjp) in seconds instead of a full
bench ladder.

    python benchmarks/solve_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.opt.lbfgs import lbfgs_minimize
    from varanneal_tpu.kernels import solve_pallas

    print("device:", jax.devices()[0])
    tw = lorenz96_twin(D=20, N_data=41, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc="trapezoid", P=np.array([4.0]),
                      pidx=[0])
    opts = LBFGSOptions(maxiter=50, m=5, pgtol=1e-4, ftol=1e-6,
                        direction="two_loop")
    print("supported:", solve_pallas.solve_supported(
        spec, np.float32(1.0), opts))
    action, _ = make_action(spec)
    vag = jax.value_and_grad(action)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(rng.normal(0, 1, spec.n_state + 1)
                      .astype(np.float32))
    rf = np.float32(4e-6)
    solver = jax.jit(solve_pallas.make_rung_solver(spec, opts))
    t0 = time.time()
    rk = solver(xp0, rf)
    fk = float(rk.f)                       # host barrier
    print(f"kernel compile+run: {time.time() - t0:.1f}s  "
          f"f={fk:.8g} niter={int(rk.niter)} nfev={int(rk.nfev)} "
          f"status={int(rk.status)}")
    rx = lbfgs_minimize(lambda z: vag(z, rf), xp0, opts=opts)
    print(f"xla               : f={float(rx.f):.8g} "
          f"niter={int(rx.niter)} nfev={int(rx.nfev)} "
          f"status={int(rx.status)}")
    dx = float(jnp.max(jnp.abs(rk.x - rx.x)))
    print(f"max|dx|={dx:.3g}")
    ok = (int(rk.status) == int(rx.status)
          and abs(fk - float(rx.f)) <= 1e-3 * max(abs(float(rx.f)), 1e-9))
    print("PROBE", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
