"""Measured probe: FE anisotropy of the NaKL SH action in the parameters.

Answers two round-3 questions (PARITY.md "18-parameter campaign"):
(a) is the dt=0.04 SH discretization biased in the fast m-timescale? NO —
    FE at the exact fine-grid truth path is ~3e-6 and the tm0 scan has its
    minimum at the truth;
(b) why do ladders pin kinetic timescales at bounds? Because per unit RF
    the action prices a +900% tm0 error at ~4e-5 vs ~0.1 for a 10% gNa
    error — kinetics are priced ~4 decades of RF later than conductances,
    after basins have frozen.

State fixed at the exact fine-grid truth; vary one parameter at a time;
report FE(p) curves (uniform rf=1 per equation) and the per-equation
residual RMS at truth. CPU f64.
"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from varanneal_tpu.models import nakl, NAKL_P_TRUE, NAKL_PNAMES
from varanneal_tpu.twin import nakl_np_single
from varanneal_tpu.ops.spec import build_spec
from varanneal_tpu.ops.action import make_action

N, dt, seed, seg = 3001, 0.04, 7, 75
rng = np.random.default_rng(seed)
t = dt * np.arange(N)
steps = rng.uniform(-25.0, 60.0, size=N // seg + 2)
stim = np.interp(np.arange(N), np.arange(len(steps)) * seg, steps)
sub = 10
stim_f = np.interp(np.arange(N * sub) / sub, np.arange(N), stim)
p = np.asarray(NAKL_P_TRUE)
x = np.array([-65.0, 0.1, 0.6, 0.3])
out = [x.copy()]
h = dt / sub
for i in range((N - 1) * sub):
    I = stim_f[i]
    fnp = lambda xx: nakl_np_single(xx, p, I)
    k1 = fnp(x); k2 = fnp(x + h/2*k1); k3 = fnp(x + h/2*k2); k4 = fnp(x + h*k3)
    x = x + h/6*(k1 + 2*k2 + 2*k3 + k4)
    out.append(x.copy())
fine = np.asarray(out)            # (N-1)*sub+1 at dt/10
X_half = fine[::sub // 2]         # dt/2 grid -> SH fine grid (2N-1, 4)
V = fine[::sub][:, 0:1] + 1.0 * rng.normal(size=(N, 1))

Pidx = list(range(1, 19))
spec = build_spec(nakl, 4, V, t, [0], 1.0, disc="SimpsonHermite",
                  P=p, pidx=Pidx, stim=stim)
action, parts = make_action(spec)
assert spec.n_state == (2 * N - 1) * 4, spec.n_state
XP0 = np.concatenate([X_half.ravel(), p[Pidx]])
rf = np.ones((spec.N_f - 1, 4))
A0, ME0, FE0 = [float(v) for v in parts(jnp.asarray(XP0), jnp.asarray(rf))]
print(f"truth: A={A0:.6g} ME={ME0:.6g} FE={FE0:.6g}")

# per-equation FE at truth: zero out rf per column
for j, nm in enumerate("V m h n".split()):
    rfj = np.zeros_like(rf); rfj[:, j] = 1.0
    fej = float(parts(jnp.asarray(XP0), jnp.asarray(rfj))[2])
    print(f"  FE[{nm}] at truth = {fej:.6g}")

# 1-D parameter scans, x fixed at truth
for pname, lo, hi in [("tm0", 0.05, 1.0), ("th0", 0.5, 5.0), ("gNa", 60, 200),
                      ("tm1", 0.1, 2.0)]:
    jp = NAKL_PNAMES.index(pname)
    jloc = Pidx.index(jp)
    vals = np.linspace(lo, hi, 13)
    fes = []
    for v in vals:
        XP = XP0.copy(); XP[spec.n_state + jloc] = v
        fes.append(float(parts(jnp.asarray(XP), jnp.asarray(rf))[2]))
    fes = np.asarray(fes)
    jmin = int(fes.argmin())
    print(f"{pname}: truth {p[jp]} | FE min at {vals[jmin]:.4g} | "
          + " ".join(f"{v:.3g}:{fe:.4g}" for v, fe in zip(vals, fes)))
