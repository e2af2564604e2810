"""Prior-width dose-response figure for the 18-parameter NaKL
tight-box campaigns: truth-watershed hit rate vs the width of the
physiological prior the fresh draws came from.

Each point is one completed own-draw-anchored campaign (a phase-1 save
or its `.campaign/data` facts archive): x = the draw-box width of the
shrunk kinetic/reversal coordinates as a fraction of the wide
literature box (1/box_shrink), y = the fraction of members whose final
median parameter error beats the hit threshold (default 15 %), with a
Wilson 95 % binomial interval. The wide-box point (box_shrink = 1,
clampH16: 0 % hits) and the shrink-6 positives (tightbox16/64:
100 %) bracket the curve; the sweep stages (shrink 4/3/2, seeds 21-23)
fill in where coverage fails. Campaigns run with a non-default
box-offset (truth allowed at the box edge) are drawn as open markers —
they probe robustness at fixed width, not a new width.

Truth-seeded saves (e.g. probeT7) are oracle probes, not fresh-draw
coverage measurements, and are refused.

Usage:
    python benchmarks/nakl_prior_sweep_fig.py \
        .campaign/data/clampH16_facts.npz \
        .campaign/data/shrink4_facts.npz \
        .campaign/data/tightbox16_facts.npz \
        .campaign/data/tightbox64_facts.npz \
        --out docs/nakl_prior_sweep.png

Reference context: the reference framework has no ensemble/prior
machinery at all (SURVEY.md §2: user-managed inits, process-parallel
via adolcID); this figure documents the workflow this framework ships
instead (models.nakl_param_boxes + parallel.draw_anchored_problem +
the anchored f32 ladder).
"""
import argparse

import numpy as np

from nakl_coverage import coverage_stats

# Reference data-viz palette (validated fixed order; same constants as
# benchmarks/nakl_campaign_fig.py): slot-1 blue for the series, neutral
# grays for grid/text.
BLUE = "#2a78d6"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"


def wilson(k, n, z=1.96):
    """Wilson 95% score interval for a binomial proportion."""
    p = k / n
    den = 1 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return center - half, center + half


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("saves", nargs="+",
                    help="phase-1 saves or facts archives (own-draw "
                         "anchored fresh-draw campaigns)")
    ap.add_argument("--hit-thresh", type=float, default=15.0)
    ap.add_argument("--out", type=str, default="nakl_prior_sweep.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = []
    for path in args.saves:
        s = coverage_stats(path, hit_thresh=args.hit_thresh)
        assert not s["seed_truth"], \
            f"{path} is a truth-seeded oracle probe, not a fresh-draw " \
            "coverage measurement"
        k, n = int(s["hits"].sum()), s["B"]
        lo, hi = wilson(k, n)
        pts.append(dict(path=path, shrink=s["box_shrink"],
                        width=1.0 / s["box_shrink"], k=k, n=n,
                        rate=100.0 * k / n, lo=100 * lo, hi=100 * hi,
                        offset=s["box_offset"], seed=s["seed"]))
        print(f"{path}: shrink={s['box_shrink']:g} offset="
              f"{s['box_offset']:g} seed={s['seed']} -> {k}/{n}")

    fig, ax = plt.subplots(figsize=(7.2, 4.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    pts.sort(key=lambda p: (p["width"], p["offset"], p["n"]))
    # the dose-response series: default-offset campaigns, one line
    # through per-width POOLED rates (same prior ⇒ poolable draws);
    # offset probes overlay as open markers
    base = [p for p in pts if p["offset"] <= 0.5]
    probe = [p for p in pts if p["offset"] > 0.5]
    widths = sorted({p["width"] for p in base})
    pooled = []
    for w in widths:
        grp = [p for p in base if p["width"] == w]
        k, n = sum(p["k"] for p in grp), sum(p["n"] for p in grp)
        pooled.append((w, 100.0 * k / n))
    ax.plot([w for w, _ in pooled], [r for _, r in pooled], "-",
            color=BLUE, lw=2, zorder=2)
    for p in base:
        ax.errorbar([p["width"]], [p["rate"]],
                    yerr=[[p["rate"] - p["lo"]], [p["hi"] - p["rate"]]],
                    fmt="o", color=BLUE, ms=7, capsize=3, lw=1.2,
                    zorder=3)
    for p in probe:
        ax.errorbar([p["width"]], [p["rate"]],
                    yerr=[[p["rate"] - p["lo"]], [p["hi"] - p["rate"]]],
                    fmt="o", mfc=SURFACE, mec=BLUE, color=BLUE, ms=7,
                    capsize=3, lw=1.2, zorder=3)

    # selective direct labels: B and seed per campaign, staggered
    for i, p in enumerate(pts):
        tag = f"B={p['n']}, s{p['seed']}"
        if p["offset"] > 0.5:
            tag += f", off={p['offset']:g}"
        dy = -14 - 11 * sum(1 for q in pts[:i]
                            if q["width"] == p["width"])
        ax.annotate(tag, (p["width"], p["rate"]),
                    textcoords="offset points", xytext=(6, dy),
                    fontsize=7.5, color=TEXT_2)

    ax.set_xscale("log")
    xt = sorted({p["width"] for p in pts})
    ax.set_xticks(xt)
    ax.set_xticklabels([f"1/{1 / w:g}" if w < 1 else "1 (wide)"
                        for w in xt], fontsize=9)
    ax.minorticks_off()
    ax.set_ylim(-6, 112)
    ax.set_xlabel("prior width (fraction of the wide literature box, "
                  "kinetics/reversals; conductances stay wide)",
                  fontsize=9.5, color=TEXT)
    ax.set_ylabel(f"truth-watershed hit rate (%)\n"
                  f"(final median param err < "
                  f"{args.hit_thresh:g}%)", fontsize=9.5, color=TEXT)
    ax.set_title("18-parameter NaKL: fresh-draw hit rate vs prior "
                 "width\n(N=6001, K=3 protocols, own-draw anchors, "
                 "f32 ladder)", fontsize=10.5, color=TEXT)
    ax.grid(True, which="major", color=GRID, lw=0.7, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT_2, labelsize=9)

    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
