"""Twin-experiment utilities: synthetic data generation for the benchmark
configs (BASELINE.md). The reference keeps equivalent scripts next to its
examples (SURVEY.md §4 "synthetic data generation ... lives in example
scripts"); here they are a library so bench.py / examples / tests share one
deterministic source.
"""

import numpy as np


def rk4_path(f, x0, dt, n_steps, p, stim=None, t0=0.0):
    """Integrate dx/dt = f(t, x, p) with classic RK4 from x0 (D,).

    ``f`` follows the model-call convention (vectorized over leading axes);
    ``stim``: optional (n_steps+1, S) — held constant over each step.
    Returns (n_steps+1, D).
    """
    x = np.asarray(x0, float).copy()
    out = [x.copy()]
    t = t0
    for i in range(n_steps):
        def g(xx):
            xb = xx[None, :]
            if stim is not None:
                pp = (np.asarray(p, float), np.asarray(stim[i], float)[None, :])
            else:
                pp = np.asarray(p, float)
            return np.asarray(f(np.asarray([t]), xb, pp))[0]
        k1 = g(x)
        k2 = g(x + dt / 2 * k1)
        k3 = g(x + dt / 2 * k2)
        k4 = g(x + dt * k3)
        x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        out.append(x.copy())
        t += dt
    return np.asarray(out)


def lorenz96_twin(D=20, N_data=161, dt=0.025, F=8.17, sigma=0.5,
                  n_obs=8, seed=2027, spin=2000):
    """The canonical config (BASELINE config #1): Lorenz-96 twin data.

    Observed indices follow the evenly-spread pattern of the reference's
    bundled example ([M] SURVEY.md appendix: L=8 of D=20 →
    [0,2,5,7,10,12,15,17], generalized here to any D/n_obs).
    Returns dict(traj, Y, t, Lidx, RM, sigma).
    """
    from varanneal_tpu.models import lorenz96

    def f_np(t, x, p):
        return np.asarray(lorenz96(t, x, np.asarray(p)))

    rng = np.random.default_rng(seed)
    x0 = rng.normal(size=D) + F
    x0 = rk4_path(f_np, x0, dt, spin, np.array([F]))[-1]
    traj = rk4_path(f_np, x0, dt, N_data - 1, np.array([F]))
    # evenly spread observed components: floor(i*D/L) reproduces the
    # reference example's [0,2,5,7,10,12,15,17] for D=20, L=8
    Lidx = sorted(set(int(np.floor(i * D / n_obs)) for i in range(n_obs)))
    Y = traj[:, Lidx] + sigma * rng.normal(size=(N_data, len(Lidx)))
    t = dt * np.arange(N_data)
    return dict(traj=traj, Y=Y, t=t, Lidx=Lidx, RM=1.0 / sigma ** 2,
                sigma=sigma, F=F, dt=dt)
