"""Truth-basin action probe: anneal ONLY the states (parameters clamped
at the twin truth) up the same ladder as the 18-parameter campaigns,
and report the final action — the best action attainable inside the
true-parameter basin.

Completes the round-3 basin-selection measurement chain (PARITY.md):
 - free 18-param ladders select V-compensated basins (best final
   action ~2.6e6 at the clampF2 config);
 - members SEEDED at truth drift away during the ascent and still end
   HIGHER (4.8e6+) — the path expels them;
 - this probe says whether the true basin, held together, UNDERCUTS
   the compensated winners (path artifact: annealing can't keep what
   it can't price yet) or not (the objective's global minimum really
   is a compensated solution at this record/noise).

Run: PYTHONPATH=. python benchmarks/nakl_truth_action.py
     [--protocols 3] [--nbeta 61] [--maxiter 60] [--repeats 2]
Matches examples/nakl_ensemble.py constants (seg pattern, seeds,
gate-rf-scale, RF0 = 1e-5 * [1, s, s, s], alpha 1.6).
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--protocols", type=int, default=3)
    ap.add_argument("--nbeta", type=int, default=61)
    ap.add_argument("--maxiter", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--gate-rf-scale", type=float, default=1e7)
    ap.add_argument("--alpha", type=float, default=1.6)
    ap.add_argument("--n", type=int, default=3001)
    ap.add_argument("--save", type=str,
                    default=".campaign/truth_action.npz")
    ap.add_argument("--params-from", type=str, default=None,
                    help="clamp parameters at a CAMPAIGN ESTIMATE "
                         "instead of truth: an npz with XP (polished "
                         "save) or xp/A (phase-1 save; best by final "
                         "action); log-space entries are decoded. "
                         "With --n above the campaign's record this "
                         "measures whether a longer record flips the "
                         "basin ordering")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from varanneal_tpu.twin import nakl_twin
    from varanneal_tpu.models import nakl, NAKL_P_TRUE
    from varanneal_tpu.ops import build_spec
    from varanneal_tpu.ops.action import pack
    from varanneal_tpu.opt import LBFGSOptions
    from varanneal_tpu.anneal.checkpoint import run_ladder_checkpointed
    from varanneal_tpu.api import build_bounds

    K, N, dt = args.protocols, args.n, 0.04
    segs = [75, 45, 110, 60, 90, 35]
    tws = [nakl_twin(N=N, dt=dt, sigma=1.0, seed=7 + 97 * k,
                     seg=segs[k % len(segs)], i_min=-25.0, i_max=60.0)
           for k in range(K)]
    P = np.asarray(NAKL_P_TRUE, np.float64)
    if args.params_from:
        d = np.load(args.params_from)
        if "XP" in d.files:
            xp_src = d["XP"]
        else:
            xp_src = d["xp"][np.argsort(d["A"][:, -1])[0]]
        pe = np.asarray(xp_src[-18:], np.float64)   # fix_cm campaigns
        TAU_ALL = (9, 10, 13, 14, 17, 18)
        G_ALL = (1, 3, 5)
        Pidx18 = list(range(1, 19))
        log_loc = [j for j, pi in enumerate(Pidx18)
                   if pi in TAU_ALL + G_ALL]
        pe[log_loc] = np.exp(pe[log_loc])
        P = P.copy()
        P[1:] = pe
        rel = np.abs(P - np.asarray(NAKL_P_TRUE)) / np.abs(NAKL_P_TRUE)
        print(f"clamping at campaign estimate from {args.params_from} "
              f"(med err {np.median(rel[1:]) * 100:.1f}%)")
    specs = [build_spec(nakl, 4, tk["V"].astype(np.float32), tk["t"],
                        [0], 1.0, disc="SimpsonHermite", P=P, pidx=[],
                        stim=tk["stim"]) for tk in tws]
    if K == 1:
        from varanneal_tpu.ops.action import make_action
        action, parts = make_action(specs[0])
    else:
        from varanneal_tpu.ops.multi import make_multi_action
        action, parts = make_multi_action(specs)
    spec = specs[0]

    # state init exactly as the campaigns: V from data, gates slaved to
    # TRUTH kinetics steady state (no jitter — one member)
    blocks = []
    for tk in tws:
        N_f = spec.N_f
        V_f = np.interp(np.arange(N_f) / 2.0, np.arange(N), tk["V"][:, 0])

        def a_inf(va, dva):
            return 0.5 * (1.0 + np.tanh((V_f - va) / dva))

        gates = [a_inf(P[7], P[8]), a_inf(P[11], P[12]),
                 a_inf(P[15], P[16])]
        blocks.append(np.column_stack([V_f] + gates).ravel())
    xp0 = jnp.asarray(np.concatenate(blocks).astype(np.float32))[None]

    STATE_BOUNDS = [(-150.0, 70.0), (0.0, 1.0), (0.0, 1.0), (0.0, 1.0)]
    lo1, hi1 = build_bounds(spec, STATE_BOUNDS, np.float32)
    lo = jnp.concatenate([lo1] * K) if K > 1 else lo1
    hi = jnp.concatenate([hi1] * K) if K > 1 else hi1

    rf_dir = np.array([1.0] + [args.gate_rf_scale] * 3)
    rf0 = np.ascontiguousarray(np.broadcast_to(
        1e-5 * rf_dir, (spec.N_f - 1, 4))).astype(np.float32)
    opts = LBFGSOptions(maxiter=args.maxiter, m=5, pgtol=1e-4,
                        ftol=1e-6, bounded_algo="subspace")
    res = run_ladder_checkpointed(
        action, parts, xp0, np.arange(args.nbeta, dtype=np.float32),
        jnp.asarray(rf0), args.alpha,
        ckpt_path=args.save.replace(".npz", "_ckpt.npz"),
        save_every=1, lower=lo, upper=hi, opts=opts, store_paths=False,
        batched=True, repeats=args.repeats, verbose=True)
    A = np.asarray(res.A)
    print("truth-basin annealed action per rung (tail):", A[0, -6:])
    print(f"FINAL truth-basin action: {A[0, -1]:.6g}")
    np.savez(args.save, A=A, XP=np.asarray(res.XP))
    return 0


if __name__ == "__main__":
    sys.exit(main())
