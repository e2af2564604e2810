"""Per-iteration cost breakdown of the L-BFGS ladder hot loop (TPU).

The roofline study (PARITY.md) diagnosed the canonical-config ladder as
SERIALIZATION-bound: each L-BFGS iteration is a chain of tens of small
kernels and per-kernel fixed cost dominates at B=1. This probe measures,
each as ONE device dispatch of a ``fori_loop`` with K repetitions (so
host/tunnel dispatch latency is excluded):

  - vag:   fused action+gradient evaluation (the line-search eval)
  - dir:   the compact-form L-BFGS direction (_compact_dir)
  - dirp:  the fused Pallas direction kernel (if available)
  - hist:  history update + termination math (dots, norms, scatter)

Canonical config shapes: Lorenz-96 D=20 trapezoid N=161 -> n = 3221.
Run: PYTHONPATH=... python benchmarks/iter_breakdown.py [n] [B]
"""

import sys
import time

import numpy as np


def timed_loop(fn, x, K, label):
    import jax

    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / K
    print(f"{label:>6}: {dt * 1e6:9.2f} us/call")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3221
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    m = 5
    dtype = jnp.float32

    from varanneal_tpu.twin import lorenz96_twin
    from varanneal_tpu.models import lorenz96
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt.lbfgs import _compact_dir, _two_loop

    tw = lorenz96_twin(D=20, N_data=161, n_obs=8)
    spec = build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc="trapezoid", P=np.array([4.0]),
                      pidx=[0])
    action, parts = make_action(spec)
    rf = jnp.asarray(4e-6 * tw["RM"] * 1.5 ** 50, dtype)

    key = jax.random.PRNGKey(0)
    nn = spec.n_state + spec.NPest
    x0 = jax.random.normal(key, (B, nn), dtype)
    H0 = jax.random.normal(key, (B, 2 * m, nn), dtype) * 0.01
    g0 = jax.random.normal(key, (B, nn), dtype)
    head = jnp.zeros((B,), jnp.int32) + 2
    hlen = jnp.zeros((B,), jnp.int32) + m

    def vag1(x):
        f, g = jax.value_and_grad(lambda z: action(z, rf))(x)
        return f, g

    @jax.jit
    def loop_vag(x):
        def body(i, c):
            x, acc = c
            f, g = jax.vmap(vag1)(x)
            return x + 1e-12 * g, acc + f.sum()
        return lax.fori_loop(0, K, body, (x, jnp.zeros((), dtype)))[1]

    @jax.jit
    def loop_dir(args):
        H, g, hd, hl = args
        def body(i, c):
            g, acc = c
            d = jax.vmap(
                lambda gi, Hi, hdi, hli: _compact_dir(
                    gi, Hi, None, hdi, hli, m, dtype))(g, H, hd, hl)
            return g + 1e-12 * d, acc + d[0, 0]
        return lax.fori_loop(0, K, body, (g, jnp.zeros((), dtype)))[1]

    @jax.jit
    def loop_two(args):
        H, g, hd, hl = args
        rho = jnp.full((B, m), 1.0, dtype)
        def body(i, c):
            g, acc = c
            d = jax.vmap(
                lambda gi, Hi, ri, hdi, hli: _two_loop(
                    gi, Hi, ri, hdi, hli, m, dtype))(g, H, rho, hd, hl)
            return g + 1e-12 * d, acc + d[0, 0]
        return lax.fori_loop(0, K, body, (g, jnp.zeros((), dtype)))[1]

    @jax.jit
    def loop_hist(args):
        H, g, hd, hl = args
        def body(i, c):
            g, acc = c
            sv, yv = g, g * 1.0001
            sy = jnp.sum(sv * yv, axis=-1)
            s_n = jnp.sqrt(jnp.sum(sv * sv, axis=-1))
            y_n = jnp.sqrt(jnp.sum(yv * yv, axis=-1))
            good = sy > 1e-10 * s_n * y_n
            Hn = jax.vmap(lambda h, u, w, kp, i0: jnp.where(
                kp, h.at[i0].set(u).at[m + i0].set(w), h))(
                H, sv, yv, good, hd)
            pg = jnp.max(jnp.abs(g), axis=-1)
            return g + 1e-12 * Hn[:, 0], acc + pg.sum()
        return lax.fori_loop(0, K, body, (g, jnp.zeros((), dtype)))[1]

    from varanneal_tpu.kernels.dir_pallas import compact_dir_pallas

    @jax.jit
    def loop_dirp(args):
        H, g, hd, hl = args
        def body(i, c):
            g, acc = c
            d = jax.vmap(compact_dir_pallas)(g, H, hd, hl)
            return g + 1e-12 * d, acc + d[0, 0]
        return lax.fori_loop(0, K, body, (g, jnp.zeros((), dtype)))[1]

    print(f"n={nn} B={B} K={K} device={jax.devices()[0].platform}")
    t_vag = timed_loop(loop_vag, x0, K, "vag")
    t_dir = timed_loop(loop_dir, (H0, g0, head, hlen), K, "dir")
    t_dirp = timed_loop(loop_dirp, (H0, g0, head, hlen), K, "dirp")
    t_two = timed_loop(loop_two, (H0, g0, head, hlen), K, "two")
    t_hist = timed_loop(loop_hist, (H0, g0, head, hlen), K, "hist")
    est = 1.3 * t_vag + t_dirp + t_hist
    print(f"est iteration (1.3 vag + dirp + hist): {est * 1e6:.1f} us "
          f"(bench measured ~38 us/iter at B=1 post-dirp)")


if __name__ == "__main__":
    main()
