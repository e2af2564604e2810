"""NaKL voltage-only identifiability study (VERDICT r02 next-round #1
fallback deliverable): Fisher-information spectrum of the 18 estimated
parameters (Cm fixed) from forward sensitivities of the voltage trace.

Thin driver over the library primitives ``diag.forward_sensitivity`` /
``diag.fisher_report`` (promoted from this script in round 3). Method and
criterion: sensitivities are scaled to RELATIVE parameter moves
(S_ij = p_j dV_i/dp_j), F = Σ_k S_k^T S_k / σ²; an eigenvalue λ < N means
a 100 % move along that eigendirection changes the V trace by < 1 σ rms —
the data cannot see it. Comparing K = 1, 2, 3 protocol stacks quantifies
exactly what the joint estimation (ops/multi.py) buys.

    JAX_PLATFORMS=cpu python benchmarks/nakl_identifiability.py
"""
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)

from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PNAMES
from varanneal_tpu import diag


def main():
    from varanneal_tpu.twin import nakl_twin
    N, dt, sigma = 3001, 0.04, 1.0
    segs = [75, 45, 110]
    protocols = [nakl_twin(N=N, dt=dt, sigma=sigma, seed=7 + 97 * k,
                           seg=segs[k], i_min=-25.0, i_max=60.0)["stim"]
                 for k in range(3)]
    est = list(range(1, 19))           # all but Cm
    names = [NAKL_PNAMES[j] for j in est]
    t = dt * np.arange(N)
    x0 = np.asarray([-65.0, 0.1, 0.6, 0.3])
    Ss = [diag.forward_sensitivity(nakl, x0, t, NAKL_P_TRUE, est,
                                   stim=stim, obs=(0,), sub=10)
          for stim in protocols]
    for K in (1, 2, 3):
        rep = diag.fisher_report(Ss[:K], sigma=sigma, names=names,
                                 flat_cut=N)
        w = rep.eigvals
        print(f"\n=== K={K} protocol(s): Fisher eigenvalues "
              f"(relative-parameter basis, sigma={sigma} mV, N={N}) ===")
        print("  lam (descending):",
              np.array2string(w[::-1], precision=2, max_line_width=100,
                              formatter={'float': lambda v: f"{v:.2e}"}))
        print("  flat directions (lam < N -> <1-sigma signal "
              f"per 100% move; N={N}):")
        for lam, comp in rep.flat:
            cs = " ".join(f"{c:+.2f}*{nm}" for c, nm in comp)
            print(f"    lam={lam:9.3g}  {cs}")
        worst = np.argsort(-rep.crlb)[:6]
        print("  worst relative CRLBs (1-sigma fraction of p):")
        for j in worst:
            print(f"    {names[j]:>4}: {100 * rep.crlb[j]:8.2f} %")
    np.savez("/tmp/nakl_identifiability.npz",
             **{f"S{k}": S for k, S in enumerate(Ss)})


if __name__ == "__main__":
    main()
