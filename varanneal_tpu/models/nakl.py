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
import numpy as np

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


# Wide per-parameter estimation boxes for the full 19-parameter twin
# experiment (order = NAKL_PNAMES; truth well inside every box). These
# are the campaign-defining constants of the round-3 18-parameter study
# (PARITY.md): the reference leaves bounds to the driving script
# (SURVEY.md §2 "bounds"), but the measured recipe made them part of the
# supported workflow, so they live here rather than in an example.
NAKL_PBOUNDS = (
    (0.5, 3.0),      # Cm
    (50., 200.),     # gNa
    (20., 80.),      # ENa
    (5., 60.),       # gK
    (-100., -50.),   # EK
    (0.05, 1.0),     # gL
    (-75., -40.),    # EL
    (-60., -20.),    # vm
    (5., 30.),       # dvm
    (0.05, 1.0),     # tm0
    (0.1, 2.0),      # tm1
    (-80., -40.),    # vh
    (-30., -5.),     # dvh
    (0.1, 5.0),      # th0
    (1., 15.),       # th1
    (-75., -35.),    # vn
    (10., 50.),      # dvn
    (0.1, 5.0),      # tn0
    (1., 15.),       # tn1
)

# Index groups (into NAKL_PNAMES) for log-space estimation: the six gate
# timescales and the three conductances — all positive scale parameters.
NAKL_TAU_IDX = (9, 10, 13, 14, 17, 18)
NAKL_G_IDX = (1, 3, 5)                      # gNa, gK, gL

NAKL_STATE_BOUNDS = ((-150., 70.), (0., 1.), (0., 1.), (0., 1.))


def nakl_param_boxes(p_idx, *, log_tau=False, log_g=False,
                     box_shrink=1.0, box_offset=0.5,
                     box_shrink_all=False, seed=0):
    """Estimation-scale parameter boxes for the NaKL twin experiment.

    Returns ``(pbounds, log_idx)``: a list of ``(lo, hi)`` bounds, one
    per entry of ``p_idx`` (indices into ``NAKL_PNAMES``), on the scale
    the decision vector carries (log for timescales/conductances when
    ``log_tau``/``log_g``), and the tuple of ``NAKL_PNAMES`` indices
    estimated in log space.

    ``box_shrink > 1`` builds the literature-style physiological prior
    measured in PARITY.md's round-3 campaign: kinetics and reversals are
    known to voltage-clamp / Nernst accuracy, so their boxes shrink by
    that factor around an offset-jittered center near truth (the jitter,
    up to ``box_offset`` half-widths, keeps the centers honest — they
    are NOT truth), while Cm and the cell-specific conductances keep the
    wide box (unless ``box_shrink_all``). Deterministic in ``seed``
    (offsets from ``default_rng(seed + 777)``) so a polish phase
    rebuilds the identical boxes from saved campaign metadata.
    """
    p_idx = list(p_idx)
    pbounds = [NAKL_PBOUNDS[j] for j in p_idx]
    log_idx = tuple((NAKL_TAU_IDX if log_tau else ())
                    + (NAKL_G_IDX if log_g else ()))
    if log_idx:
        pbounds = [(np.log(b[0]), np.log(b[1])) if pi in log_idx else b
                   for b, pi in zip(pbounds, p_idx)]
    if box_shrink != 1.0:
        S = float(box_shrink)
        keep_wide = () if box_shrink_all else (0,) + NAKL_G_IDX
        p_tr = np.asarray(NAKL_P_TRUE, np.float64)[p_idx].copy()
        log_loc = [j for j, pi in enumerate(p_idx) if pi in log_idx]
        if log_loc:
            p_tr[log_loc] = np.log(p_tr[log_loc])
        rng_box = np.random.default_rng(seed + 777)
        off = rng_box.uniform(-box_offset, box_offset, len(p_idx))
        shr = []
        for j, (pi, (b0, b1), c) in enumerate(zip(p_idx, pbounds, p_tr)):
            if pi in keep_wide:
                shr.append((b0, b1))
                continue
            w = (b1 - b0) / (2.0 * S)
            c = c + off[j] * w
            shr.append((max(b0, c - w), min(b1, c + w)))
        pbounds = shr
    return pbounds, log_idx


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


def nakl_log_model(log_idx):
    """Log-space estimation reparameterization (round-3 measured recipe,
    promoted from ``examples/nakl_ensemble.py`` in round 4): the SH
    action is ~4 decades less sensitive to kinetic-TIMESCALE error than
    to conductance error per unit rf (benchmarks/nakl_fe_anisotropy.py),
    and in linear scale the under-priced rungs pin tau (and gL) at a box
    edge; estimating those coordinates in log space makes their moves
    multiplicative (scale-free curvature, symmetric box, log-uniform
    draws).

    ``log_idx``: full-parameter-vector indices estimated in log space
    (e.g. ``nakl_param_boxes(...)[1]``). Returns ``(model_f, P_base)``:
    a model callable that exponentiates those coordinates before the
    NaKL dynamics, and the truth vector with the same coordinates
    logged (the estimation-scale base for ``build_spec(P=...)``)."""
    P_base = np.asarray(NAKL_P_TRUE, dtype=np.float64).copy()
    if not log_idx:
        return nakl, P_base
    P_base[list(log_idx)] = np.log(P_base[list(log_idx)])
    log_arr = jnp.asarray(tuple(log_idx))

    def model_f(t, x, p):
        pp, st = p if isinstance(p, tuple) else (p, None)
        pp = jnp.asarray(pp)
        pl = pp.at[..., log_arr].set(jnp.exp(pp[..., log_arr]))
        return nakl(t, x, pl if st is None else (pl, st))

    return model_f, P_base


def nakl_ss_gates(V_f, p=NAKL_P_TRUE):
    """Steady-state gate paths slaved to a voltage trace: [m_inf(V),
    h_inf(V), n_inf(V)] for the kinetics in full parameter vector ``p``
    (round-2 measured recipe: random gate paths land in V-compensated
    basins; slaving the initial gates to the data voltage does not)."""
    V_f = np.asarray(V_f, np.float64)
    p = np.asarray(p, np.float64)

    def a_inf(va, dva):
        return 0.5 * (1.0 + np.tanh((V_f - va) / dva))

    return [a_inf(p[7], p[8]), a_inf(p[11], p[12]), a_inf(p[15], p[16])]


def nakl_ensemble_inits(rng, B, pbounds, Vfs, *, pidx,
                        gates_random=False, gates_own_ss=False,
                        seed_pool=None, seed_jitter=0.03,
                        dtype=np.float32):
    """Build the (B, n) packed ensemble of the measured NaKL campaign
    recipe (promoted from ``examples/nakl_ensemble.py``): per member, a
    parameter draw (uniform from the estimation boxes, or jittered from
    a ``seed_pool`` of prior-campaign estimates), with per-protocol
    state blocks of the data voltage + steady-state gate paths (slaved
    to the TRUTH kinetics, or to the member's OWN kinetics draw with
    ``gates_own_ss`` — each member then starts dynamically
    self-consistent) + small gate jitter.

    ``Vfs``: list of per-protocol model-grid voltages (len K, each
    (N_f,)); ``pbounds``: estimation-scale boxes for ``pidx``. The RNG
    call sequence is part of the campaign-reproducibility contract
    (saved seeds rebuild identical draws) — do not reorder."""
    n_f = len(Vfs[0])
    gates_ss_truth = [nakl_ss_gates(V_fk) for V_fk in Vfs]
    xp0s = []
    for bi in range(B):
        if seed_pool is not None:
            base_pe = seed_pool[bi % seed_pool.shape[0]]
            pe = [float(np.clip(v + rng.normal(0.0, seed_jitter
                                               * (b[1] - b[0])),
                                b[0], b[1]))
                  for v, b in zip(base_pe, pbounds)]
        else:
            pe = [rng.uniform(*b) for b in pbounds]
        pfull = np.asarray(NAKL_P_TRUE, dtype=np.float64).copy()
        pfull[list(pidx)] = pe
        blocks = []
        for V_fk, gss in zip(Vfs, gates_ss_truth):
            if gates_random:
                gates = [rng.uniform(0, 1, n_f) for _ in range(3)]
            else:
                if gates_own_ss:
                    gss = nakl_ss_gates(V_fk, pfull)
                gates = [np.clip(g + rng.normal(0, 0.05, n_f), 0, 1)
                         for g in gss]
            blocks.append(np.column_stack([V_fk] + gates).ravel())
        xp0s.append(np.concatenate(blocks + [pe]).astype(dtype))
    return np.stack(xp0s)
