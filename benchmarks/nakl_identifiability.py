"""NaKL voltage-only identifiability study (VERDICT r02 next-round #1
fallback deliverable): Fisher-information spectrum of the 18 estimated
parameters (Cm fixed) from forward sensitivities of the voltage trace.

Method: integrate the NaKL model from the true initial state under the
experiment's injected-current protocol with RK4 on the fine grid (the same
integrator that generated the twin data), differentiate the V(t_n) samples
w.r.t. the parameters with forward-mode AD (jax.jacfwd through lax.scan),
scale to RELATIVE parameter changes (S_ij = p_j dV_i/dp_j), and form the
Fisher matrix F = S^T S / sigma^2. Small eigenvalues of F are flat
parameter combinations: a relative combination with eigenvalue lam changes
the V trace by ~sqrt(lam/N) of sigma per 100% parameter move — below ~1,
the data cannot see it. Multi-protocol designs STACK sensitivities, so
F_multi = sum_k F_k; comparing spectra for K=1,2,3 protocols quantifies
exactly what the joint estimation (ops/multi.py) buys.

    JAX_PLATFORMS=cpu python benchmarks/nakl_identifiability.py
"""
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PNAMES


def make_sim(N, dt, stim, sub=10):
    """V samples (N,) as a function of the 19-parameter vector."""
    stim_f = np.interp(np.arange(N * sub) / sub, np.arange(N), stim)
    h = dt / sub
    x0 = jnp.asarray([-65.0, 0.1, 0.6, 0.3])
    stim_j = jnp.asarray(stim_f)

    def sim(p):
        def f1(x, I):
            return nakl(jnp.zeros((1,)), x[None, :], (p, I[None, None]))[0]

        def step(x, I):
            k1 = f1(x, I)
            k2 = f1(x + h / 2 * k1, I)
            k3 = f1(x + h / 2 * k2, I)
            k4 = f1(x + h * k3, I)
            xn = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return xn, xn[0]

        _, Vs = jax.lax.scan(step, x0, stim_j[: (N - 1) * sub])
        return jnp.concatenate([x0[0:1], Vs[sub - 1:: sub]])

    return sim


def fisher(N, dt, sigma, protocols):
    """Per-protocol relative-sensitivity matrices S_k (N, 18; Cm fixed)."""
    p_true = jnp.asarray(NAKL_P_TRUE)
    est = list(range(1, 19))           # all but Cm
    Ss = []
    for stim in protocols:
        sim = make_sim(N, dt, stim, sub=10)
        J = jax.jacfwd(sim)(p_true)    # (N, 19)
        S = np.asarray(J[:, est]) * np.asarray(p_true)[est][None, :]
        Ss.append(S / sigma)
    return Ss, [NAKL_PNAMES[j] for j in est]


def main():
    from varanneal_tpu.twin import nakl_twin
    N, dt, sigma = 3001, 0.04, 1.0
    segs = [75, 45, 110]
    protocols = [nakl_twin(N=N, dt=dt, sigma=sigma, seed=7 + 97 * k,
                           seg=segs[k], i_min=-25.0, i_max=60.0)["stim"]
                 for k in range(3)]
    Ss, names = fisher(N, dt, sigma, protocols)
    for K in (1, 2, 3):
        F = sum(S.T @ S for S in Ss[:K])
        w, V = np.linalg.eigh(F)
        print(f"\n=== K={K} protocol(s): Fisher eigenvalues "
              f"(relative-parameter basis, sigma={sigma} mV, N={N}) ===")
        print("  lam (descending):",
              np.array2string(w[::-1], precision=2, max_line_width=100,
                              formatter={'float': lambda v: f"{v:.2e}"}))
        # identifiability criterion: a 100% move along eigvec v changes
        # the V trace rms by sqrt(lam/N)*sigma -> need lam >> N for a
        # few-% estimate; report the flat tail's composition
        print("  flat directions (lam < N -> <1-sigma signal "
              f"per 100% move; N={N}):")
        for i in range(len(w)):
            if w[i] >= N:
                continue
            v = V[:, i]
            top = np.argsort(-np.abs(v))[:4]
            comp = " ".join(f"{v[j]:+.2f}*{names[j]}" for j in top)
            print(f"    lam={w[i]:9.3g}  {comp}")
        # relative 1-sigma CRLB per parameter (diagonal of F^-1)
        Finv = np.linalg.inv(F + 1e-12 * np.eye(18))
        crlb = np.sqrt(np.diag(Finv))
        worst = np.argsort(-crlb)[:6]
        print("  worst relative CRLBs (1-sigma fraction of p):")
        for j in worst:
            print(f"    {names[j]:>4}: {100 * crlb[j]:8.2f} %")
    np.savez("/tmp/nakl_identifiability.npz",
             **{f"S{k}": S for k, S in enumerate(Ss)})


if __name__ == "__main__":
    main()
