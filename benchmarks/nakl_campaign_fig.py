"""Closing figure for the round-3 18-parameter NaKL campaign: per-member
action ladders (f32 phase 1) with f64-polished endpoints, one series per
campaign, against the truth-basin attainable-action reference.

The ordering claim this draws (PARITY.md round 3): at N=6001 the action
ORDERS the basins correctly — the truth basin, when reached (anchored
truth-jittered seeds, probeT7), polishes to a LOWER f64 action than
every compensated fresh-draw member (clampH16) — so action ranking plus
the anchored ladder does the selection whenever the ensemble covers the
watershed.

Usage:
    python benchmarks/nakl_campaign_fig.py \
        --run "truth-seeded (probeT7):/tmp/nakl_r3/probeT7.npz" \
        --run "fresh draws (clampH16):/tmp/nakl_r3/clampH16.npz" \
        --truth-ref 3.29e6 --out nakl_f64_ordering.png

Each --run is "label:phase1_save.npz"; a sibling *_polished.npz (the
f64 polish output of examples/nakl_ensemble.py) is overlaid when
present. Phase-1 curves carry the weak own-draw anchor penalty where
the run used one; the polished endpoints and the reference line are
prior-free (the polish strips anchors), which is the comparison that
matters.
"""
import argparse

import numpy as np

# Reference data-viz palette (validated fixed order): slot 1 blue,
# slot 2 orange; neutral grays for reference/grid/text.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="append", required=True,
                    help='"label:path/to/phase1.npz" (repeatable, '
                         "series order = argument order)")
    ap.add_argument("--truth-ref", type=float, default=None,
                    help="truth-basin attainable action at this record "
                         "(clamped-basin probe) for the reference line")
    ap.add_argument("--out", type=str, default="nakl_f64_ordering.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8.0, 4.8), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    x_max = 0
    for si, spec in enumerate(args.run):
        label, path = spec.split(":", 1)
        c = SERIES[si % len(SERIES)]
        sd = np.load(path)
        A = np.asarray(sd["A"], np.float64)          # (B, n_rungs)
        n_beta = A.shape[1]
        x = np.arange(1, n_beta + 1)
        x_max = max(x_max, n_beta)
        for b in range(A.shape[0]):
            ax.plot(x, A[b], color=c, lw=0.9, alpha=0.35, zorder=2)
        # emphasize the best-by-final-action member (direct label anchor)
        bb = int(np.argmin(A[:, -1]))
        ax.plot(x, A[bb], color=c, lw=2.0, alpha=0.95, zorder=3,
                label=f"{label} (B={A.shape[0]}, f32 ladder)")
        pol_path = path[:-4] + "_polished.npz"
        try:
            pol = np.load(pol_path)
        except FileNotFoundError:
            pol = None
        if pol is not None:
            Ap = np.asarray(pol["A_polished"], np.float64)
            # polish climbs ~10 rungs past the ladder top (see example)
            xp = np.full(Ap.shape, n_beta + 10)
            ax.scatter(xp, Ap, s=42, color=c, edgecolor=SURFACE,
                       linewidth=1.2, zorder=4,
                       label=f"{label} — f64 polished")
            x_max = max(x_max, n_beta + 10)

    if args.truth_ref is not None:
        ax.axhline(args.truth_ref, color=TEXT_2, lw=1.2, ls=(0, (4, 3)),
                   zorder=1)
        ax.annotate("truth-basin attainable action (params clamped)",
                    xy=(1, args.truth_ref), xytext=(2, args.truth_ref * 1.6),
                    color=TEXT_2, fontsize=8.5)

    ax.set_yscale("log")
    ax.set_xlim(0, x_max + 3)
    ax.set_xlabel("annealing rung β (RF = RF0·αᵝ)", color=TEXT)
    ax.set_ylabel("action A (log scale)", color=TEXT)
    ax.set_title("18-parameter NaKL at N=6001: the action orders the "
                 "basins —\ntruth (when reached) beats every compensated "
                 "fresh-draw member", color=TEXT, fontsize=11, loc="left")
    ax.tick_params(colors=TEXT_2, labelsize=8.5)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.grid(True, which="major", color=GRID, lw=0.6, zorder=0)
    leg = ax.legend(loc="lower right", fontsize=8.5, frameon=False)
    for t in leg.get_texts():
        t.set_color(TEXT)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
