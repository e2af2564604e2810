"""Evaluate an 18/19-parameter NaKL campaign save against twin truth.

Works on phase-1 ensemble saves (xp/A [+ xp_snap] from
examples/nakl_ensemble.py --save), phase-1 chunk checkpoints
(*_p1_ckpt.npz: leaf0/snap0/A), and polished saves (XP/A). Prints
per-member parameter-error tables (median/max relative error, worst
parameter), the best-by-median member, and the timescale-pinning
diagnostics the round-3 campaigns track (PARITY.md).

Run: PYTHONPATH=. python benchmarks/nakl_eval.py SAVE.npz \
        [--protocols K] [--n N] [--rank-col C] [--top T]
"""

import argparse
import os

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

TAU_ALL = (9, 10, 13, 14, 17, 18)
G_ALL = (1, 3, 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save")
    ap.add_argument("--protocols", type=int, default=None,
                    help="default: meta_protocols / protocols key")
    ap.add_argument("--n", type=int, default=None,
                    help="record length (default: meta_N / N key)")
    ap.add_argument("--rank-col", type=int, default=-1,
                    help="A column used for action ranking (default "
                         "last; snapshot evals may want snap_rung*reps-1)")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--use-snapshot", action="store_true",
                    help="evaluate xp_snap/snap0 instead of the final xp")
    ap.add_argument("--log-tau", action="store_true",
                    help="override when the save carries no meta")
    ap.add_argument("--log-g", action="store_true")
    args = ap.parse_args()

    from varanneal_tpu.models import NAKL_P_TRUE, NAKL_PNAMES

    d = np.load(args.save, allow_pickle=True)
    keys = set(d.keys())

    def meta(name, default=None):
        for k in (name, "meta_" + name):
            if k in keys:
                return d[k][()] if d[k].ndim == 0 else d[k]
        return default

    K = args.protocols or int(meta("protocols", 1))
    N = args.n or int(meta("N", 3001))
    fix_cm = bool(meta("fix_cm", True))
    log_tau = bool(meta("log_tau", False)) or args.log_tau
    log_g = bool(meta("log_g", False)) or args.log_g
    Pidx = list(range(1, 19)) if fix_cm else list(range(19))
    LOG_IDX = (TAU_ALL if log_tau else ()) + (G_ALL if log_g else ())
    log_loc = [j for j, pi in enumerate(Pidx) if pi in LOG_IDX]
    n_state_tot = K * (2 * N - 1) * 4

    if "p_all" in keys and not args.use_snapshot:
        # polished multi-member save (phase 2): per-member parameter
        # estimates stored directly as p_all (B, npar) with A_polished
        # ranking — the state vector only carries the winner (round-5)
        # p_all is stored ALREADY back-transformed to linear scale
        # (examples/nakl_ensemble.py applies p_linear before saving)
        ests_raw = np.asarray(d["p_all"])
        npar = ests_raw.shape[1]
        Pidx = list(range(1, 19)) if npar == 18 else list(range(19))
        log_loc = []
        truth = np.asarray(NAKL_P_TRUE)[Pidx]
        names = [NAKL_PNAMES[pi] for pi in Pidx]
        A1 = (np.asarray(d["A_polished"]) if "A_polished" in keys
              else np.zeros(len(ests_raw)))
        cand = (np.asarray(d["candidates"]) if "candidates" in keys
                else np.arange(len(ests_raw)))
        print(f"{args.save}: POLISHED save, {len(ests_raw)} members, "
              f"npar={npar}, log_tau={log_tau}, log_g={log_g}")
        for r in np.argsort(A1):
            p = ests_raw[r].astype(np.float64).copy()
            if log_loc:
                p[log_loc] = np.exp(p[log_loc])
            rel = np.abs(p - truth) / np.abs(truth)
            print(f"  member {int(cand[r]):3d}: A={A1[r]:.6g} "
                  f"med {np.median(rel) * 100:5.1f}% "
                  f"max {np.max(rel) * 100:6.1f}% "
                  f"(worst {names[int(np.argmax(rel))]})")
        return

    if args.use_snapshot:
        xp = d["xp_snap"] if "xp_snap" in keys else d["snap0"]
    elif "xp" in keys:
        xp = d["xp"]
    elif "XP" in keys:
        xp = d["XP"]
        if xp.ndim == 1:
            xp = xp[None]
    elif "leaf0" in keys:
        xp = d["leaf0"]
    else:
        xp = d["xp0"]          # in-flight ladder checkpoint state
    A = d["A"] if "A" in keys else None
    if A is not None and A.ndim == 1:
        A = A[None]

    def p_lin(pest):
        p = np.asarray(pest, np.float64).copy()
        if log_loc:
            p[log_loc] = np.exp(p[log_loc])
        return p

    truth = np.asarray(NAKL_P_TRUE)[Pidx]
    names = [NAKL_PNAMES[pi] for pi in Pidx]
    B = xp.shape[0]
    print(f"{args.save}: B={B}, K={K}, N={N}, fix_cm={fix_cm}, "
          f"log_tau={log_tau}, log_g={log_g}, "
          f"source={'snapshot' if args.use_snapshot else 'final'}")

    # params sit directly after the states; own-draw-prior saves carry
    # the per-member anchor center as EXTRA trailing coords — never read
    # beyond npar
    ests = np.stack([p_lin(xp[k, n_state_tot:n_state_tot + len(Pidx)])
                     for k in range(B)])
    rels = np.abs(ests - truth) / np.abs(truth)
    med = np.median(rels, axis=1) * 100
    mx = rels.max(axis=1) * 100

    if A is not None:
        order = np.argsort(A[:, args.rank_col])
        print(f"top {args.top} by action (col {args.rank_col}):")
        for r, k in enumerate(order[: args.top]):
            print(f"  rank {r} member {k:3d}: A={A[k, args.rank_col]:.5g} "
                  f"med {med[k]:5.1f}% max {mx[k]:6.1f}% "
                  f"(worst {names[int(np.argmax(rels[k]))]})")
    kb = int(np.argmin(med))
    print(f"best-by-median member {kb}: med {med[kb]:.1f}% "
          f"max {mx[kb]:.1f}%")
    for j, nm in enumerate(names):
        print(f"  {nm:>4}: est {ests[kb, j]:9.4f} truth {truth[j]:9.4f} "
              f"({100 * (ests[kb, j] - truth[j]) / truth[j]:+6.1f}%)")
    for pi, nm in ((9, "tm0"), (17, "tn0"), (5, "gL")):
        if pi in Pidx:
            col = ests[:, Pidx.index(pi)]
            q = np.percentile(col, [25, 50, 75])
            print(f"{nm} quartiles {q.round(4)} truth {NAKL_P_TRUE[pi]}")


if __name__ == "__main__":
    main()
