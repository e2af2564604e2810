"""Coverage diagnostic for own-draw-anchored NaKL campaign saves.

The anchor centers stored in an `--prior-own-draw` save ARE the
members' initial parameter draws (frozen by the degenerate per-member
box — `parallel.draw_anchored_problem`), so a completed campaign save
carries the full draw → outcome map. This tool quantifies the
COVERAGE failure mode isolated in PARITY.md's round-3 campaign: how
far (in box-width-normalized estimation-scale coordinates) was each
member's draw from the twin truth, and what did it converge to?

Usage: python benchmarks/nakl_coverage.py /tmp/nakl_r3/clampH.npz

Prints a per-member table sorted by draw distance (d_inf = worst
single coordinate; d_med = median coordinate) against the member's
final median parameter error and action rank, plus the ensemble
minimum draw distance — the measured reach a fresh-draw ensemble of
this size achieves into the 18-dimensional box. Compare with the
anchored oracle probe (probeT7: draws jittered 0.03 box-widths from
truth, d_inf ≈ 0.07, ALL retained): the gap between min(d_inf) and
the retention radius is the coverage shortfall that sets the required
ensemble size.

Reference context: the reference's ensemble practice is user-managed
multiprocessing over inits (SURVEY.md §2 `adolcID`); this framework
vmaps/shards members instead (`parallel/ensemble.py`), so coverage
scales with chips, not processes.
"""

import argparse

import numpy as np

from varanneal_tpu.models import NAKL_P_TRUE as P_TRUE
from varanneal_tpu.models import NAKL_PNAMES as PNAMES

TAU_ALL = (9, 10, 13, 14, 17, 18)
G_ALL = (1, 3, 5)

# draw boxes: the example's campaign-defining constant (it has no
# library home — examples/nakl_ensemble.py::PBOUNDS_ALL)
PBOUNDS_ALL = [
    (0.5, 3.0), (50., 200.), (20., 80.), (5., 60.), (-100., -50.),
    (0.05, 1.0), (-75., -40.), (-60., -20.), (5., 30.), (0.05, 1.0),
    (0.1, 2.0), (-80., -40.), (-30., -5.), (0.1, 5.0), (1., 15.),
    (-75., -35.), (10., 50.), (0.1, 5.0), (1., 15.),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    d = np.load(args.save)
    keys = set(d.keys())
    assert "prior_own_draw" in keys and bool(d["prior_own_draw"]), \
        "not an own-draw-anchored save (no draw record to analyze)"
    fix_cm = bool(d["fix_cm"]) if "fix_cm" in keys else True
    log_tau = bool(d["log_tau"]) if "log_tau" in keys else False
    log_g = bool(d["log_g"]) if "log_g" in keys else False
    Pidx = list(range(1 if fix_cm else 0, 19))
    npar = len(Pidx)
    LOG_IDX = (TAU_ALL if log_tau else ()) + (G_ALL if log_g else ())

    # estimation-scale truth / bounds per estimated parameter
    tr, lo, hi = [], [], []
    for pi in Pidx:
        b0, b1 = PBOUNDS_ALL[pi]
        t = P_TRUE[pi]
        if pi in LOG_IDX:
            b0, b1, t = np.log(b0), np.log(b1), np.log(t)
        tr.append(t), lo.append(b0), hi.append(b1)
    tr = np.asarray(tr)
    wdt = np.asarray(hi) - np.asarray(lo)

    xp = d["xp"]
    A = d["A"][:, -1]
    # anchored layout invariant: [... states, npar params, npar anchors]
    # — slice from the END (layout-independent; what the example itself
    # does), never via a recomputed disc-specific state count
    draws = xp[:, -npar:].astype(np.float64)           # anchors = draws
    ests = xp[:, -2 * npar:-npar].astype(np.float64)

    dn = np.abs(draws - tr) / wdt                      # (B, npar)
    d_inf = dn.max(axis=1)
    d_med = np.median(dn, axis=1)

    # final linear-scale parameter errors
    est_lin = ests.copy()
    loc = [j for j, pi in enumerate(Pidx) if pi in LOG_IDX]
    est_lin[:, loc] = np.exp(est_lin[:, loc])
    tr_lin = np.asarray([P_TRUE[pi] for pi in Pidx])
    rel = np.abs(est_lin - tr_lin) / np.abs(tr_lin)
    med_err = np.median(rel, axis=1) * 100

    rankA = np.argsort(np.argsort(A))
    order = np.argsort(d_inf)
    B = xp.shape[0]
    print(f"{args.save}: B={B}, npar={npar}, log_tau={log_tau}, "
          f"log_g={log_g}")
    print(f"closest {args.top} draws to truth "
          f"(d in box-widths, estimation scale):")
    print("  member  d_inf  d_med   worst-coord      "
          "final med err   A rank")
    for k in order[: args.top]:
        wc = PNAMES[Pidx[int(np.argmax(dn[k]))]]
        print(f"  {k:6d}  {d_inf[k]:5.3f}  {d_med[k]:5.3f}   "
              f"{wc:>9s}        {med_err[k]:6.1f}%        "
              f"{int(rankA[k]):3d}/{B}")
    print(f"ensemble min d_inf = {d_inf.min():.3f}, "
          f"min d_med = {d_med.min():.3f} "
          f"(retention radius measured by the anchored oracle probe: "
          f"d_inf ~ 0.07)")
    # per-coordinate: how close does the BEST draw get in each direction
    best_per_coord = dn.min(axis=0)
    worst3 = np.argsort(-best_per_coord)[:5]
    print("hardest coordinates to cover (min over members of "
          "per-coord distance):")
    for j in worst3:
        print(f"  {PNAMES[Pidx[j]]:>4}: nearest draw "
              f"{best_per_coord[j]:.3f} box-widths from truth")
    r = np.corrcoef(d_med, med_err)[0, 1]
    print(f"corr(median draw distance, final median error) = {r:+.2f}")


if __name__ == "__main__":
    main()
