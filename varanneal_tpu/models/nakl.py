"""NaKL Hodgkin–Huxley neuron (Na + K + leak), the standard VA benchmark
model of the Abarbanel group (BASELINE.json config #3: joint state+parameter
estimation from voltage-only data, stimulus-driven).

State x = [V, m, h, n] (D = 4). Kinetics use the tanh form

    a_inf(V) = 0.5 * (1 + tanh((V - va) / dva))
    tau_a(V) = ta0 + ta1 * (1 - tanh^2((V - va) / dva))

and dynamics

    C dV/dt = gNa m^3 h (ENa - V) + gK n^4 (EK - V) + gL (EL - V) + I_inj(t)
    da/dt   = (a_inf(V) - a) / tau_a(V)        for a in {m, h, n}

Parameter vector (NP = 19), in order:

    [Cm, gNa, ENa, gK, EK, gL, EL,
     vm, dvm, tm0, tm1,  vh, dvh, th0, th1,  vn, dvn, tn0, tn1]

The injected current is the stimulus: the model is called as
``nakl(t, x, (p, stim))`` with stim shape (..., 1), following the
reference's driven-system convention (SURVEY.md §2 "stimulus").
"""

import jax.numpy as jnp

NAKL_PNAMES = (
    "Cm", "gNa", "ENa", "gK", "EK", "gL", "EL",
    "vm", "dvm", "tm0", "tm1",
    "vh", "dvh", "th0", "th1",
    "vn", "dvn", "tn0", "tn1",
)

# Standard twin-experiment truth values (Toth et al. / Kostuk et al. lineage).
NAKL_P_TRUE = (
    1.0, 120.0, 50.0, 20.0, -77.0, 0.3, -54.4,
    -40.0, 15.0, 0.1, 0.4,
    -60.0, -15.0, 1.0, 7.0,
    -55.0, 30.0, 1.0, 5.0,
)


def _cols(p, idx):
    p = jnp.asarray(p)
    if p.ndim == 1:
        return [p[j] for j in idx]
    return [p[..., j:j + 1] for j in idx]


def _gate(V, a, va, dva, ta0, ta1):
    th = jnp.tanh((V - va) / dva)
    a_inf = 0.5 * (1.0 + th)
    tau_a = ta0 + ta1 * (1.0 - th * th)
    return (a_inf - a) / tau_a


def nakl(t, x, p):
    """NaKL vector field. ``p`` is ``(params, stim)`` when driven."""
    if isinstance(p, tuple):
        p, stim = p
        Iinj = jnp.asarray(stim)[..., 0:1]
    else:
        Iinj = 0.0
    (Cm, gNa, ENa, gK, EK, gL, EL,
     vm, dvm, tm0, tm1, vh, dvh, th0, th1, vn, dvn, tn0, tn1) = _cols(
        p, range(19))

    V = x[..., 0:1]
    m = x[..., 1:2]
    h = x[..., 2:3]
    n = x[..., 3:4]

    dV = (gNa * m ** 3 * h * (ENa - V)
          + gK * n ** 4 * (EK - V)
          + gL * (EL - V) + Iinj) / Cm
    dm = _gate(V, m, vm, dvm, tm0, tm1)
    dh = _gate(V, h, vh, dvh, th0, th1)
    dn = _gate(V, n, vn, dvn, tn0, tn1)
    return jnp.concatenate([dV, dm, dh, dn], axis=-1)
