"""Coverage / hit-rate diagnostic for own-draw-anchored NaKL saves.

The anchor centers stored in an `--prior-own-draw` save ARE the
members' initial parameter draws (frozen by the degenerate per-member
box — `parallel.draw_anchored_problem`), so a completed campaign save
carries the full draw → outcome map. This tool quantifies the
COVERAGE failure mode isolated in PARITY.md's round-3 campaign: how
far (in box-width-normalized estimation-scale coordinates) was each
member's draw from the twin truth, and what did it converge to?

It understands both draw priors the campaign used:
- the wide uniform box (clampH: min d_inf 0.32 wide-box-widths vs the
  anchored oracle's demonstrated retention radius ~0.07 — uniform
  draws cannot cover 18-D), and
- the tight physiological prior (`--box-shrink`, tightbox16/64):
  boxes reconstructed from the saved meta via
  `models.nakl_param_boxes`, the same deterministic builder the
  example uses, so distances are reported in BOTH draw-box and
  wide-box units.

The hit-rate summary (fraction of members whose final median
parameter error beats a threshold, default 15 %) is the statistic the
tight-box campaigns measure: what fraction of fresh draws from the
prior reach and hold the truth watershed.

Usage: python benchmarks/nakl_coverage.py /tmp/nakl_r3/clampH.npz
       python benchmarks/nakl_coverage.py /tmp/nakl_r3/tightbox64.npz

Reference context: the reference's ensemble practice is user-managed
multiprocessing over inits (SURVEY.md §2 `adolcID`); this framework
vmaps/shards members instead (`parallel/ensemble.py`), so coverage
scales with chips, not processes.
"""

import argparse

import numpy as np

from varanneal_tpu.models import NAKL_P_TRUE as P_TRUE
from varanneal_tpu.models import NAKL_PNAMES as PNAMES
from varanneal_tpu.models import NAKL_PBOUNDS, nakl_param_boxes


def coverage_stats(save, hit_thresh=15.0):
    """Draw→outcome statistics of an own-draw-anchored save (or its
    `.campaign/data` facts archive): per-member draw distances (in
    wide-box widths, estimation scale), final median parameter errors,
    and the hit-rate summary. Returns a plain dict so the CLI below,
    the prior-width dose-response figure
    (benchmarks/nakl_prior_sweep_fig.py) and tests share one
    implementation."""
    d = np.load(save)
    keys = set(d.keys())
    assert "prior_own_draw" in keys and bool(d["prior_own_draw"]), \
        "not an own-draw-anchored save (no draw record to analyze)"

    def meta(name, default):
        return d[name][()] if name in keys else default

    fix_cm = bool(meta("fix_cm", True))
    log_tau = bool(meta("log_tau", False))
    log_g = bool(meta("log_g", False))
    box_shrink = float(meta("box_shrink", 1.0))
    box_offset = float(meta("box_offset", 0.5))
    box_shrink_all = bool(meta("box_shrink_all", False))
    seed = int(meta("seed", 0))
    Pidx = list(range(1 if fix_cm else 0, 19))
    npar = len(Pidx)

    # the DRAW boxes (the actual prior, incl. any tight-box shrink) and
    # the WIDE boxes (the cross-campaign distance unit), both on the
    # estimation scale, from the same deterministic library builder the
    # example used at campaign time
    draw_bounds, LOG_IDX = nakl_param_boxes(
        Pidx, log_tau=log_tau, log_g=log_g, box_shrink=box_shrink,
        box_offset=box_offset, box_shrink_all=box_shrink_all, seed=seed)
    wide_bounds, _ = nakl_param_boxes(Pidx, log_tau=log_tau, log_g=log_g)

    tr = np.asarray([np.log(P_TRUE[pi]) if pi in LOG_IDX else P_TRUE[pi]
                     for pi in Pidx])
    w_wide = np.asarray([b1 - b0 for b0, b1 in wide_bounds])
    w_draw = np.asarray([b1 - b0 for b0, b1 in draw_bounds])

    A = d["A"][:, -1]
    if "xp" in keys:
        xp = d["xp"]
        # anchored layout invariant: [... states, npar params, npar
        # anchors] — slice from the END (layout-independent; what the
        # example itself does), never via a recomputed disc-specific
        # state count
        draws = xp[:, -npar:].astype(np.float64)       # anchors = draws
        ests = xp[:, -2 * npar:-npar].astype(np.float64)
    else:
        # a .campaign/data facts archive (archive_facts.py strips the
        # bulky decision vectors but keeps exactly these two fields) —
        # every PARITY hit-rate claim recomputes from the in-repo data
        draws = d["draws"].astype(np.float64)
        ests = d["p_final"].astype(np.float64)

    dn = np.abs(draws - tr) / w_wide                   # (B, npar), wide
    d_inf = dn.max(axis=1)
    d_med = np.median(dn, axis=1)

    # final linear-scale parameter errors
    est_lin = ests.copy()
    loc = [j for j, pi in enumerate(Pidx) if pi in LOG_IDX]
    est_lin[:, loc] = np.exp(est_lin[:, loc])
    tr_lin = np.asarray([P_TRUE[pi] for pi in Pidx])
    rel = np.abs(est_lin - tr_lin) / np.abs(tr_lin)
    med_err = np.median(rel, axis=1) * 100

    return dict(
        B=draws.shape[0], npar=npar, Pidx=Pidx, LOG_IDX=LOG_IDX,
        log_tau=log_tau, log_g=log_g, box_shrink=box_shrink,
        box_offset=box_offset, seed=seed, seed_truth=bool(
            meta("seed_truth", False)),
        w_wide=w_wide, w_draw=w_draw, draws=draws, dn=dn,
        d_inf=d_inf, d_med=d_med, med_err=med_err, A=A,
        hits=med_err < hit_thresh, hit_thresh=hit_thresh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--hit-thresh", type=float, default=15.0,
                    help="median-relative-error %% below which a "
                         "member counts as a truth-watershed hit")
    args = ap.parse_args()
    s = coverage_stats(args.save, hit_thresh=args.hit_thresh)
    (B, npar, Pidx, med_err, d_inf, d_med, dn, A, w_draw, w_wide) = (
        s["B"], s["npar"], s["Pidx"], s["med_err"], s["d_inf"],
        s["d_med"], s["dn"], s["A"], s["w_draw"], s["w_wide"])
    log_tau, log_g, box_shrink = s["log_tau"], s["log_g"], s["box_shrink"]

    rankA = np.argsort(np.argsort(A))
    order = np.argsort(d_inf)
    print(f"{args.save}: B={B}, npar={npar}, log_tau={log_tau}, "
          f"log_g={log_g}, box_shrink={box_shrink}")
    if box_shrink != 1.0:
        shrunk = [j for j in range(npar)
                  if w_draw[j] < w_wide[j] - 1e-12]
        print(f"tight-box prior: {len(shrunk)}/{npar} boxes shrunk "
              f"x{box_shrink} (draw-box width = "
              f"{np.median(w_draw[shrunk] / w_wide[shrunk]):.3f} "
              f"wide-box widths, median over shrunk coords)")
    print(f"closest {args.top} draws to truth "
          f"(d in WIDE-box widths, estimation scale):")
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

    # --- hit-rate: the tight-box campaign's closing statistic --------
    hits = med_err < args.hit_thresh
    q = np.percentile(med_err, [25, 50, 75])
    print(f"hit rate (final med err < {args.hit_thresh:g}%): "
          f"{int(hits.sum())}/{B} = {100.0 * hits.mean():.0f}%")
    print(f"final med-err quartiles: {q[0]:.1f}% / {q[1]:.1f}% / "
          f"{q[2]:.1f}%  (min {med_err.min():.1f}%, "
          f"max {med_err.max():.1f}%)")
    if hits.any():
        worst_hit_d = d_med[hits].max()
        print(f"widest-draw hit: d_med = {worst_hit_d:.3f} wide-box "
              f"widths (measured reach of the prior+anchor+ladder "
              f"pipeline)")


if __name__ == "__main__":
    main()
