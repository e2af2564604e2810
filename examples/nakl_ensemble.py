"""NaKL ensemble estimation — the full VA methodology for config #3.

Round-1 experiments showed the NaKL voltage-only inverse problem has a
near-degenerate conductance/reversal manifold: single inits land in
compensated basins with perfect V tracking but wrong parameters. The
working recipe (this script is now a THIN DRIVER — the staged machinery
lives in the library, ``varanneal_tpu.workflow`` (``phase1``/``polish``
on ``anneal/checkpoint.py :: run_ladder_checkpointed``)):

1. bipolar injected current (probes the I-V curve across a wide V range);
2. an f32 ensemble of random gate/parameter initializations, annealed on
   device with CHUNKED dispatches (long single dispatches crash some TPU
   runtimes — and chunking also bounds preemption loss), per-rung
   ``repeats`` for deep solves, and a ``snapshot_beta`` pre-divergence
   state capture;
3. f64 polish of the lowest-action members (deep inner solves), runnable
   in a separate (CPU) process from the saved phase-1 state.

Two-process workflow:

    # phase 1 on the TPU
    python examples/nakl_ensemble.py --ninit 64 --no-polish --save ens.npz
    # phase 2 wherever f64 is fast (CPU)
    JAX_PLATFORMS=cpu python examples/nakl_ensemble.py --load ens.npz \
        --polish-top 3

``--all-params`` estimates all 19 NaKL parameters with wide bounds
(Kostuk/Toth-style); default estimates the 5 conductances/reversals
[gNa, ENa, gK, EK, gL].

Why ``--gate-rf-scale`` matters (measured, round 2): with a scalar RF the
V-equation residual (units mV/ms, scale ~30) and the gate-kinetics
residuals (units 1/ms, scale ~1) are weighted equally, so a relative
violation of the gate kinetics costs ~1000x less than the same relative
violation of the voltage equation. The free Hermite–Simpson gate
midpoints then absorb the V measurement noise (m pegs at its bound, gate
paths 0.1-0.3 RMSE off truth) while the V path overfits the data to
0.13 mV — and the parameter projection onto that overfit path pins gL at
its lower bound and EK near -100 for EVERY ensemble member.
``--gate-rf-scale 1000`` (~ the squared scale ratio) equalizes relative
violation costs; on the small config it recovers EK to +0.2% and gL to
+0.7% where the scalar-RF run had them at the box bounds.
"""

import argparse
import sys
import time

import numpy as np

# Estimation boxes live in the library now (the measured round-3 recipe
# promoted them): varanneal_tpu.models.NAKL_PBOUNDS / NAKL_STATE_BOUNDS
# / nakl_param_boxes (wide boxes, log-space groups, tight-box prior).
STATE_BOUNDS = [(-150., 70.), (0., 1.), (0., 1.), (0., 1.)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--ninit", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=2,
                    help="dispatches per jitted chunk "
                         "(run_ladder_checkpointed save_every)")
    ap.add_argument("--maxiter", type=int, default=400,
                    help="inner L-BFGS iterations PER DISPATCH; use "
                         "--repeats for deeper per-rung solves (this "
                         "testbed kills device dispatches that run "
                         "longer than ~60 s)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="re-minimize each β rung this many times "
                         "(warm-started, one dispatch each) — bounded-"
                         "dispatch equivalent of repeats*maxiter "
                         "iterations per rung")
    ap.add_argument("--polish-repeats", type=int, default=1,
                    help="same, for the f64 polish rungs")
    ap.add_argument("--polish-maxiter", type=int, default=2000)
    ap.add_argument("--polish-top", type=int, default=4)
    ap.add_argument("--polish-batch", type=int, default=4,
                    help="polish members in sequential batches of at "
                         "most this size (measured: the f64 NaKL-SH "
                         "program at B=6 crashes this testbed's TPU "
                         "worker deterministically, B=4 runs clean — "
                         "CLAUDE.md; 0 = one batch)")
    ap.add_argument("--snap-beta", type=int, default=None,
                    help="record the phase-1 ensemble state after this "
                         "many β rungs as the f64 polish restart point "
                         "(default n_beta-21 — the last rung before f32 "
                         "round-off loses the global basin on this "
                         "problem, measured in PARITY.md)")
    ap.add_argument("--no-polish", action="store_true")
    ap.add_argument("--seed-params", type=str, default=None,
                    help="warm-start the ensemble's PARAMETER draws from "
                         "a prior campaign's phase-1 save (.npz with "
                         "xp/A): top --seed-top members by final action, "
                         "tiled over --ninit with --seed-jitter "
                         "(fraction of each box width) Gaussian jitter "
                         "in estimation scale. States are still built "
                         "from the CURRENT record (data V + "
                         "member-kinetics gates), so a short-record "
                         "screen can seed a long-record refinement")
    ap.add_argument("--seed-top", type=int, default=16)
    ap.add_argument("--seed-jitter", type=float, default=0.03)
    ap.add_argument("--seed-truth", action="store_true",
                    help="ORACLE-BASIN PROBE: seed every member's "
                         "parameter draw at the twin truth "
                         "(+ --seed-jitter). Not an estimation mode — "
                         "a diagnostic that asks whether the true basin "
                         "wins on action at the top of the ladder when "
                         "actually visited (separates unlucky ensemble "
                         "coverage from an objective that genuinely "
                         "prefers compensated basins)")
    ap.add_argument("--record-n", type=int, default=None,
                    help="observation record length N (default 3001; "
                         "longer records sample more spikes — the "
                         "literature's lever for kinetic timescales)")
    ap.add_argument("--param-prior", type=float, default=0.0,
                    help="with --seed-params: add a weak quadratic MAP "
                         "prior (this weight) on the estimated "
                         "parameters, centered on the screen's best "
                         "member, width --prior-w box-widths in "
                         "estimation scale (log params => log-normal). "
                         "Counters the measured edge-drift of "
                         "under-priced parameters; report MAP and "
                         "prior-free estimates together")
    ap.add_argument("--prior-w", type=float, default=0.25)
    ap.add_argument("--prior-own-draw", action="store_true",
                    help="with --param-prior: anchor EACH member's "
                         "parameters to its OWN draw (per-member center "
                         "carried as frozen extra coordinates via "
                         "batched per-member bounds) instead of a shared "
                         "center. Multi-start regularized annealing: "
                         "counters the measured path drift (truth-seeded "
                         "members expelled by rung 40 even at N=6001, "
                         "PARITY.md) while keeping ensemble coverage — "
                         "the member drawn nearest the truth basin is "
                         "HELD there and wins on action at the record "
                         "length where truth ranks first. Phase-2 polish "
                         "is prior-free")
    ap.add_argument("--all-params", action="store_true")
    ap.add_argument("--fix-cm", action="store_true",
                    help="with --all-params: hold Cm at truth (the usual "
                         "known-capacitance convention — estimating Cm "
                         "jointly with kinetics is scale-degenerate: all "
                         "currents enter as I/Cm)")
    ap.add_argument("--save", type=str, default=None,
                    help="save phase-1 ensemble state to this .npz; the "
                         "derived *_p1_ckpt.npz carries per-chunk "
                         "progress — re-running the same command resumes "
                         "a partial phase 1 after a TPU-worker crash")
    ap.add_argument("--load", type=str, default=None,
                    help="skip phase 1; load ensemble state from this .npz")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--algo", type=str, default="projection",
                    choices=["subspace", "projection"],
                    help="bounded L-BFGS algorithm. Default flipped to "
                         "projection in round 5: the paired 18-param "
                         "campaign (algoP/algoS, identical draws) "
                         "measured identical 24/24 hit rate and equal "
                         "converged actions at 1.70x less wall "
                         "(PARITY round-5); subspace = full L-BFGS-B "
                         "with GCP, kept for iterate-level reference "
                         "parity")
    ap.add_argument("--gate-rf-scale", type=float, default=1000.0,
                    help="relative model-error precision of the three "
                         "gate-kinetics equations vs the voltage equation. "
                         "The measured-good default is 1000 (see module "
                         "docstring); scalar RF (=1) lets the V residuals "
                         "dominate FE and biases gL/EK to their bounds. "
                         "s ~ (dV/dt scale / gate-rate scale)^2 "
                         "rebalances them (the literature's "
                         "state-scaling practice)")
    ap.add_argument("--gates-random", action="store_true",
                    help="uniform-random initial gate paths (default: "
                         "gates slaved to the data voltage via their "
                         "steady-state curves a_inf(V) — round-2 recipe; "
                         "random gates land in V-compensated basins)")
    ap.add_argument("--f64", action="store_true",
                    help="run phase 1 in f64 (on-device since the round-3 "
                         "LuDecomposition fix, opt/lbfgsb.py): no f32 "
                         "round-off basin loss, no snapshot/polish dance "
                         "— anneal straight to the top rung")
    ap.add_argument("--alpha", type=float, default=1.6,
                    help="ladder base RF(beta)=RF0*alpha^beta (slower "
                         "annealing = more rungs at the basin-selection "
                         "stage)")
    ap.add_argument("--nbeta", type=int, default=None,
                    help="override the number of rungs (default 61, or "
                         "41 with --small)")
    ap.add_argument("--protocols", type=int, default=1,
                    help="number of stimulus protocols annealed JOINTLY "
                         "with one shared parameter vector "
                         "(ops/multi.py): parameter combinations that "
                         "are flat under one drive are pinned by "
                         "another — the literature's multi-experiment "
                         "identifiability lever for the 19-param "
                         "estimation")
    ap.add_argument("--clamp-v-rf", type=float, default=None,
                    help="FLOOR the VOLTAGE-equation model-error "
                         "precision at this value (per-component rf_min, "
                         "anneal/ladder.py): rf_V(β) = max(C, RF0_V·α^β) "
                         "— the V equation starts the ladder already "
                         "strong and resumes annealing once the ladder "
                         "overtakes the floor. With V pinned to data by "
                         "ME, a strong V equation enforces the (certain) "
                         "current balance f_V(x,p) ≈ dV/dt pointwise "
                         "from β=0, pricing the V-compensated basins "
                         "that the annealed-V ladder was measured to "
                         "select in the 18-param mode (PARITY.md round-3 "
                         "campaign sections)")
    ap.add_argument("--gates-own-ss", action="store_true",
                    help="slave each member's initial gate paths to its "
                         "OWN kinetics draw via a_inf(V_data; member "
                         "params) instead of the truth kinetics: every "
                         "member starts dynamically self-consistent, so "
                         "the ensemble explores kinetics hypotheses "
                         "fairly and the action ranking is informative "
                         "about kinetics from the earliest rungs")
    ap.add_argument("--log-tau", action="store_true",
                    help="estimate the six gate TIMESCALE parameters "
                         "(tm0, tm1, th0, th1, tn0, tn1) in LOG space: "
                         "the SH action is measured ~4 decades less "
                         "sensitive to kinetic-timescale error than to "
                         "conductance error per unit RF "
                         "(benchmarks/nakl_fe_anisotropy.py), and in "
                         "linear tau the under-priced rungs pin tau at "
                         "a bound box edge; log parameterization makes "
                         "timescale moves multiplicative (scale-free "
                         "curvature, symmetric box, log-uniform "
                         "ensemble draws)")
    ap.add_argument("--log-g", action="store_true",
                    help="estimate the three conductances (gNa, gK, gL) "
                         "in LOG space — positive scale parameters; gL "
                         "pins at its linear lower bound in every "
                         "measured linear-box campaign")
    ap.add_argument("--box-shrink", type=float, default=1.0,
                    help="literature-style physiological prior: shrink "
                         "each estimated KINETIC and REVERSAL "
                         "parameter's box by this factor (in estimation "
                         "scale) around an offset-jittered center near "
                         "truth; the three conductances (and Cm) keep "
                         "the WIDE box unless --box-shrink-all. The "
                         "measured coverage analysis (PARITY.md round "
                         "3) shows uniform draws from the wide 18-D box "
                         "cannot reach the truth watershed; published "
                         "all-parameter estimates constrain kinetics "
                         "from voltage-clamp priors and Nernst "
                         "reversals and estimate the CELL-SPECIFIC "
                         "conductances — this flag measures exactly "
                         "that workflow")
    ap.add_argument("--box-shrink-all", action="store_true",
                    help="apply --box-shrink to every estimated "
                         "parameter (including the conductances)")
    ap.add_argument("--box-offset", type=float, default=0.5,
                    help="offset each shrunk box's center from truth by "
                         "a uniform draw up to this fraction of the "
                         "shrunk half-width, so truth is NOT centered "
                         "in the prior box (reproducible from --seed)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)   # phase 2 needs f64; the
    # phase-1 ensemble stays f32 via explicit array dtypes
    import jax.numpy as jnp
    from varanneal_tpu.models import NAKL_P_TRUE, NAKL_PNAMES
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.ops import build_spec, make_action
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu import workflow
    from varanneal_tpu.api import build_bounds
    from varanneal_tpu import diag

    # normalize once; all derived files hang off the stem (a bare name
    # without .npz previously collided the polish checkpoint with the
    # phase-1 save)
    base = args.save or args.load
    if base is not None and not base.endswith(".npz"):
        base += ".npz"
    stem = base[:-4] if base else None

    if args.load:
        saved = np.load(base)
        N = int(saved["N"]); n_beta = int(saved["n_beta"])
        dt = float(saved["dt"]); seed = int(saved["seed"])
        all_params = bool(saved["all_params"])
        if "gate_rf_scale" in saved:
            args.gate_rf_scale = float(saved["gate_rf_scale"])
        else:
            # legacy saves predate the gate weighting and were annealed
            # under scalar RF: polish with the objective they used
            print("legacy save without gate_rf_scale: using 1.0")
            args.gate_rf_scale = 1.0
        if "repeats" in saved:
            args.repeats = int(saved["repeats"])
        if "protocols" in saved:
            args.protocols = int(saved["protocols"])
        if "alpha" in saved:
            args.alpha = float(saved["alpha"])
        if "clamp_v_rf" in saved:
            c = float(saved["clamp_v_rf"])
            args.clamp_v_rf = None if c == 0.0 else c
        # a phase-1 state annealed in log space must be polished in it
        args.log_tau = bool(saved["log_tau"]) if "log_tau" in saved else False
        args.log_g = bool(saved["log_g"]) if "log_g" in saved else False
        # ... and one annealed inside a tight prior box must be polished
        # inside the SAME box (reproduced from the saved seed + meta)
        args.box_shrink = (float(saved["box_shrink"])
                           if "box_shrink" in saved else 1.0)
        args.box_shrink_all = (bool(saved["box_shrink_all"])
                               if "box_shrink_all" in saved else False)
        args.box_offset = (float(saved["box_offset"])
                           if "box_offset" in saved else 0.5)
    else:
        N = 751 if args.small else 3001
        if args.record_n is not None:
            N = int(args.record_n)
        n_beta = 41 if args.small else 61
        if args.nbeta is not None:
            n_beta = int(args.nbeta)
        dt = 0.04
        seed = args.seed
        all_params = args.all_params

    K = max(1, args.protocols)
    # protocol diversity: independent bipolar step sequences at several
    # step lengths (probes the I-V curve AND several kinetic timescales)
    segs = [75, 45, 110, 60, 90, 35]
    tws = [nakl_twin(N=N, dt=dt, sigma=1.0, seed=7 + 97 * k,
                     seg=segs[k % len(segs)], i_min=-25.0, i_max=60.0)
           for k in range(K)]
    tw = tws[0]
    traj, V, stim, t = tw["traj"], tw["V"], tw["stim"], tw["t"]

    if args.load and "fix_cm" in saved:
        args.fix_cm = bool(saved["fix_cm"])
    Pidx = (list(range(1 if args.fix_cm else 0, 19)) if all_params
            else [1, 2, 3, 4, 5])
    # Estimation-scale boxes from the library (models.nakl_param_boxes):
    # --log-tau / --log-g put the six gate timescales / three
    # conductances in log space (measured motivation: every linear-box
    # campaign pins some of tm0/tn0 and gL at a box edge while the rung
    # prices them ~4 decades of RF late — PARITY.md round-3);
    # --box-shrink builds the literature-style physiological prior
    # (tight offset-jittered kinetics/reversal boxes, wide
    # conductances), deterministic in --seed so the polish phase
    # rebuilds the identical boxes from the saved meta.
    from varanneal_tpu.models import nakl_param_boxes, NAKL_G_IDX
    pbounds, LOG_IDX = nakl_param_boxes(
        Pidx, log_tau=args.log_tau, log_g=args.log_g,
        box_shrink=args.box_shrink, box_offset=args.box_offset,
        box_shrink_all=args.box_shrink_all, seed=seed)
    log_loc = [j for j, pi in enumerate(Pidx) if pi in LOG_IDX]
    G_ALL = NAKL_G_IDX
    if args.box_shrink != 1.0:
        keep_wide = () if args.box_shrink_all else (0,) + G_ALL
        n_wide = sum(1 for pi in Pidx if pi in keep_wide)
        print(f"TIGHT-BOX PRIOR: boxes shrunk x{float(args.box_shrink)} "
              f"around offset-jittered truth (offset <= "
              f"{args.box_offset} half-widths; {n_wide} parameter(s) "
              f"kept WIDE"
              f"{'' if args.box_shrink_all else ': Cm+conductances'})")
    bounds = STATE_BOUNDS + pbounds

    from varanneal_tpu.models import nakl_log_model
    model_f, P_base = nakl_log_model(LOG_IDX)

    def p_linear(p_est):
        """Estimated subvector back to linear scale for reporting/saving."""
        p_est = np.asarray(p_est, dtype=np.float64).copy()
        if log_loc:
            p_est[..., log_loc] = np.exp(p_est[..., log_loc])
        return p_est

    # per-component RF0 direction: [V, m, h, n]; the ladder scales the
    # whole vector by alpha^beta, preserving the relative gate weighting
    rf_dir = np.array([1.0, args.gate_rf_scale, args.gate_rf_scale,
                       args.gate_rf_scale])
    rf_min = None
    if args.clamp_v_rf is not None:
        # V starts AT its floor and stiffens further once the annealed
        # 1e-5·α^β overtakes it; the gate components anneal normally
        rf_min = np.array([args.clamp_v_rf, 0.0, 0.0, 0.0])

    def make_problem(dtype, own_draw=False):
        specs = [build_spec(model_f, 4, tk["V"].astype(dtype), tk["t"], [0],
                            1.0, disc="SimpsonHermite",
                            P=P_base, pidx=Pidx,
                            stim=tk["stim"]) for tk in tws]
        if K == 1:
            action, parts = make_action(specs[0])
            lo, hi = build_bounds(specs[0], bounds, dtype)
        else:
            from varanneal_tpu.ops.multi import (make_multi_action,
                                                 build_multi_bounds)
            action, parts = make_multi_action(specs)
            lo, hi = build_multi_bounds(specs, bounds, dtype)
        if args.param_prior and (args.seed_params or args.seed_truth) \
                and not own_draw:
            # weak log-normal MAP prior centered on the seed estimate:
            # holds UNDER-PRICED parameters in place during the ascent
            # (the measured failure mode: they drift to box edges before
            # the data prices them — and the N=6001 truth-seeded probe
            # shows the drift is record-length-independent, PARITY.md),
            # and is annealed AWAY relatively as rf climbs. Width =
            # prior_w of each box width in estimation scale.
            if args.seed_truth:
                # oracle control: anchor at the twin truth — measures
                # whether a weak anchor HOLDS the truth basin through
                # the rungs that otherwise expel it
                p0 = np.asarray(NAKL_P_TRUE, np.float64)[Pidx].copy()
                if log_loc:
                    p0[log_loc] = np.log(p0[log_loc])
            else:
                sd = np.load(args.seed_params)
                ord_s = np.argsort(sd["A"][:, -1])
                # center on the TOP POOL's per-parameter MEDIAN: a
                # robust consensus — a single best-by-action member is
                # typically a V-compensated basin (measured, PARITY.md),
                # and the median across basins cancels their
                # anti-correlated compensations
                np_ = len(Pidx)
                sl = (slice(-2 * np_, -np_)
                      if ("prior_own_draw" in sd
                          and bool(sd["prior_own_draw"]))
                      else slice(-np_, None))
                pool = sd["xp"][ord_s[: max(1, args.seed_top)], sl]
                p0 = np.median(np.asarray(pool, np.float64), axis=0)
            wdt = np.asarray([b[1] - b[0] for b in pbounds], np.float64)
            lam = dtype(args.param_prior)
            p0_d = jnp.asarray(p0, dtype)
            iw2 = jnp.asarray(1.0 / (args.prior_w * wdt) ** 2, dtype)
            npar = len(Pidx)

            base_action, base_parts = action, parts

            def action_p(xp, rf):
                dp_ = xp[-npar:] - p0_d
                return (base_action(xp, rf)
                        + lam * jnp.sum(iw2 * dp_ * dp_))

            def parts_p(xp, rf):
                a, me, fe = base_parts(xp, rf)
                dp_ = xp[-npar:] - p0_d
                pen = lam * jnp.sum(iw2 * dp_ * dp_)
                return a + pen, me, fe

            action, parts = action_p, parts_p
            print(f"MAP prior: lambda={args.param_prior}, "
                  f"width={args.prior_w} box-widths, center="
                  f"{'truth (oracle)' if args.seed_truth else 'screen best'}")
        return specs[0], action, parts, lo, hi

    p1_dtype = np.float64 if args.f64 else np.float32
    if args.load and "prior_own_draw" in saved:
        # layout flag: the loaded xp carries per-member anchor centers
        own = bool(saved["prior_own_draw"])
    else:
        own = bool(args.param_prior and args.prior_own_draw)
    npar = len(Pidx)
    spec, action, parts, lo, hi = make_problem(p1_dtype, own_draw=own)
    n_state_tot = K * spec.n_state
    reps = max(1, args.repeats)
    snap = args.snap_beta if args.snap_beta is not None else n_beta - 21
    snap = max(1, min(snap, n_beta))
    if args.f64:
        snap = None          # no f32 divergence to snapshot around

    if args.load:
        xp_np = saved["xp"]; A = saved["A"]
        xp_snap = saved["xp_snap"] if "xp_snap" in saved else None
        B = xp_np.shape[0]
        print(f"loaded {base}: B={B}, N={N}, "
              f"{'19' if all_params else '5'}-param, "
              f"snapshot {'yes' if xp_snap is not None else 'no'}")
    else:
        B = args.ninit
        print(f"NaKL ensemble: N={N}, B={B}, "
              f"{int((np.diff(np.sign(traj[:, 0] + 20)) > 0).sum())} spikes, "
              f"bipolar drive, {'19' if all_params else '5'}-param",
              flush=True)
        # ---- phase 1: f32 ensemble, chunked -----------------------------
        rng = np.random.default_rng(seed)
        N_f = spec.N_f
        # per-protocol data voltage on the model grid (the library's
        # nakl_ensemble_inits slaves the gate paths to it)
        Vfs = [np.interp(np.arange(N_f) / 2.0, np.arange(N),
                         tk["V"][:, 0]) for tk in tws]
        # optional warm parameter seeding from a prior (shorter-record)
        # campaign: top members by final action, tiled over the ensemble
        # with multiplicative-scale jitter — the two-stage pipeline
        # (short-record screening -> long-record refinement) the
        # annealing literature uses for stiff kinetics
        seed_pool = None
        if args.seed_truth:
            p_truth = np.asarray(NAKL_P_TRUE, np.float64)[Pidx].copy()
            if log_loc:
                p_truth[log_loc] = np.log(p_truth[log_loc])
            seed_pool = p_truth[None]
            print("ORACLE-BASIN PROBE: parameter draws at truth "
                  f"(jitter {args.seed_jitter} box-widths)")
        elif args.seed_params:
            sd = np.load(args.seed_params)
            s_xp, s_A = sd["xp"], sd["A"]
            n_par_s = len(Pidx)
            order_s = np.argsort(s_A[:, -1])
            top = max(1, args.seed_top)
            sl_s = (slice(-2 * n_par_s, -n_par_s)
                    if ("prior_own_draw" in sd
                        and bool(sd["prior_own_draw"]))
                    else slice(-n_par_s, None))
            seed_pool = s_xp[order_s[:top], sl_s]
            print(f"seeding parameter draws from {args.seed_params}: "
                  f"top {top} members (of {s_xp.shape[0]})")
        from varanneal_tpu.models import nakl_ensemble_inits
        xp_np0 = nakl_ensemble_inits(
            rng, B, pbounds, Vfs, pidx=Pidx,
            gates_random=args.gates_random,
            gates_own_ss=args.gates_own_ss, seed_pool=seed_pool,
            seed_jitter=args.seed_jitter, dtype=p1_dtype)
        if own:
            print(f"MAP prior: lambda={args.param_prior}, "
                  f"width={args.prior_w} box-widths, center=own draw "
                  "(per member)")

        opts = LBFGSOptions(maxiter=args.maxiter, m=5, pgtol=1e-4,
                            ftol=1e-6, bounded_algo=args.algo)
        rf0_arr = np.ascontiguousarray(np.broadcast_to(
            1e-5 * rf_dir, (spec.N_f - 1, 4))).astype(p1_dtype)
        t0 = time.time()
        meta = dict(N=N, n_beta=n_beta, dt=dt, seed=seed,
                    all_params=all_params, fix_cm=args.fix_cm,
                    gate_rf_scale=args.gate_rf_scale, repeats=reps,
                    ninit=B, protocols=K, alpha=args.alpha,
                    f64=bool(args.f64),
                    clamp_v_rf=(args.clamp_v_rf or 0.0),
                    log_tau=bool(args.log_tau),
                    log_g=bool(args.log_g),
                    box_shrink=float(args.box_shrink),
                    box_shrink_all=bool(args.box_shrink_all),
                    box_offset=float(args.box_offset),
                    seed_truth=bool(args.seed_truth),
                    prior_own_draw=own)
        r1 = workflow.phase1(
            action, parts, xp_np0, np.arange(n_beta, dtype=p1_dtype),
            jnp.asarray(rf0_arr), args.alpha, lower=lo, upper=hi,
            opts=opts, n_params=npar,
            anchor_weight=(args.param_prior if own else 0.0),
            anchor_width=args.prior_w, repeats=reps, snapshot_beta=snap,
            checkpoint_stem=stem, save_every=args.chunk,
            rf_min=rf_min, meta=meta, verbose=True)
        print(f"phase-1 ensemble: {time.time() - t0:.1f}s (incl. compile)")
        xp_np = r1.XP
        A = r1.A                                    # (B, n_beta) per rung
        xp_snap = r1.snapshot
        if base:
            extra = {} if xp_snap is None else {"xp_snap": xp_snap}
            np.savez(base, xp=xp_np, A=A, **extra, **meta)
            print(f"saved phase-1 state -> {base}")

    lv = diag.action_levels(A[:, -1], rel_gap=0.02)
    print("action levels:", np.array2string(lv.levels[:5], precision=1),
          "counts:", lv.counts[:5])

    def report(XPb, label):
        # params sit directly after the states (own-draw saves carry the
        # anchor centers as extra trailing coords — never read past npar)
        p_est = p_linear(XPb[n_state_tot:n_state_tot + npar])
        print(f"{label} estimated vs truth:")
        for j, pi in enumerate(Pidx):
            tr = NAKL_P_TRUE[pi]
            print(f"  {NAKL_PNAMES[pi]:>4}: est {p_est[j]:9.4f}   "
                  f"truth {tr:9.4f}   ({100 * (p_est[j] - tr) / tr:+.1f}%)")
        V_est = XPb[: spec.n_state].reshape(spec.N_f, 4)[::2, 0]
        print(f"  V RMSE vs truth: "
              f"{np.sqrt(np.mean((V_est - traj[:, 0]) ** 2)):.3f} mV",
              flush=True)

    order = np.argsort(A[:, -1])
    report(np.asarray(xp_np)[order[0]].astype(np.float64), "phase-1 best")

    # ---- phase 2: f64 polish up the last rungs, from the snapshot --------
    # f32 cannot converge the top rungs (rf amplifies residuals below its
    # round-off floor — measured: truth-level A at β60 is ~1.4 while every
    # f32 member saturates at ~5000), so the polish restarts from the
    # pre-divergence snapshot and climbs β=snap..n_beta+9 in f64, vmapped
    # over the top-K members.
    if args.no_polish:
        return 0
    if xp_snap is not None:
        # candidate ranking at the snapshot rung (per-rung A columns;
        # legacy saves recorded per-dispatch columns = rungs x repeats)
        c = (snap if A.shape[1] == n_beta else snap * reps) - 1
        c = min(c, A.shape[1] - 1)
        order_pol = np.argsort(A[:, c])
        src, src_tag = xp_snap, f"snapshot@β{snap}"
        pol_lo = float(snap)
    else:  # legacy state without a snapshot: polish from the final state
        order_pol = order
        src, src_tag = xp_np, "final state"
        pol_lo = float(n_beta - 21)
    Ktop = min(args.polish_top, src.shape[0])
    picks = [int(k) for k in order_pol[:Ktop]]
    print(f"phase 2: f64 polish of members {picks} from {src_tag}")
    spec64, action64, parts64, lo64, hi64 = make_problem(np.float64)
    opts64 = LBFGSOptions(maxiter=args.polish_maxiter, pgtol=1e-10,
                          ftol=1e-14, bounded_algo=args.algo)
    rf0_64 = np.ascontiguousarray(np.broadcast_to(
        1e-5 * rf_dir, (spec64.N_f - 1, 4)))
    pol_betas = np.arange(pol_lo, float(n_beta + 10))
    t1 = time.time()
    # library stage (workflow.polish): strips the own-draw anchors
    # (polish is prior-free), batch-splits members per dispatch — the
    # measured worker-stability knob (B=6 crashes, B=4 clean —
    # CLAUDE.md), keeps the legacy checkpoint names so in-flight runs
    # resume unchanged
    r2 = workflow.polish(
        action64, parts64, src, pol_betas, jnp.asarray(rf0_64),
        args.alpha, lower=lo64, upper=hi64, opts=opts64, picks=picks,
        anchored_n_params=(npar if own else 0),
        batch=(args.polish_batch if args.polish_batch > 0 else Ktop),
        repeats=max(1, args.polish_repeats), checkpoint_stem=stem,
        save_every=max(args.chunk, 1), rf_min=rf_min,
        meta=dict(gate_rf_scale=args.gate_rf_scale), verbose=True)
    XPk, Ak = r2.XP, r2.A
    print(f"polish ({Ktop} members x {len(pol_betas)} β): "
          f"{time.time() - t1:.1f}s")
    results = sorted((float(Ak[j, -1]), picks[j], XPk[j])
                     for j in range(Ktop))
    for Aj, kj, XPj in results:
        print(f"member {kj}: polished A={Aj:.6g}")
        report(XPj, f"member {kj}")
    Abest, kbest, XPbest = results[0]
    print(f"\n=== final estimate: member {kbest}, polished A={Abest:.6g} ===")
    report(XPbest, "FINAL")
    if stem:
        out = stem + "_polished.npz"
        np.savez(out, XP=XPbest, member=kbest, A=Abest,
                 A_polished=np.asarray([r[0] for r in results]),
                 candidates=np.asarray([r[1] for r in results]),
                 p_est=p_linear(XPbest[n_state_tot:n_state_tot + npar]),
                 # per-member params in action order (for cross-campaign
                 # ordering tables: action + kinetics of EVERY polished
                 # member, not just the winner)
                 p_all=np.stack(
                     [p_linear(r[2][n_state_tot:n_state_tot + npar])
                      for r in results]),
                 log_tau=bool(args.log_tau),
                 log_g=bool(args.log_g))
        print(f"saved polished estimate -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
