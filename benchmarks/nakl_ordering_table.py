"""Cross-campaign f64 action-ordering table (round-3 closing analysis).

Reads any number of f64-POLISHED campaign saves (the ``*_polished.npz``
files written by ``examples/nakl_ensemble.py`` phase 2: ``A_polished``
ascending + ``p_all`` linear-scale parameter vectors in the same order)
and prints one markdown table of every polished member across all
campaigns, sorted by f64 action — the accuracy-grade form of the
round-3 basin-ordering argument (PARITY.md): if the truth-basin members
(probeT7) rank above every compensated fresh-draw member (clampH16) at
f64, the f32 top-rung comparison (2.42e6 vs 2.98e6, at the f32
round-off floor) is confirmed rather than noise.

Run: PYTHONPATH=. python benchmarks/nakl_ordering_table.py \
        probeT7=/tmp/nakl_r3/probeT7_polished.npz \
        clampH16=/tmp/nakl_r3/clampH16_polished.npz [...]
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def rows_from_save(tag, path):
    from varanneal_tpu.models import NAKL_P_TRUE, NAKL_PNAMES

    d = np.load(path, allow_pickle=True)
    A = np.asarray(d["A_polished"], dtype=np.float64)
    P = np.asarray(d["p_all"], dtype=np.float64)
    cand = np.asarray(d["candidates"]) if "candidates" in d.files else \
        np.arange(len(A))
    truth = np.asarray(NAKL_P_TRUE, dtype=np.float64)
    names = list(NAKL_PNAMES)
    if P.shape[1] == len(truth) - 1:       # --fix-cm saves drop Cm
        truth = truth[1:]
        names = names[1:]
    rows = []
    for j in range(len(A)):
        rel = np.abs(P[j] - truth) / np.abs(truth)
        w = int(np.argmax(rel))
        rows.append(dict(tag=tag, member=int(cand[j]), A=float(A[j]),
                         med=float(np.median(rel)), mx=float(rel[w]),
                         worst=f"{names[w]} {100 * (P[j][w] - truth[w]) / truth[w]:+.0f}%"))
    return rows


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    rows = []
    for spec in argv[1:]:
        tag, path = spec.split("=", 1)
        rows.extend(rows_from_save(tag, path))
    rows.sort(key=lambda r: r["A"])
    print("| rank | campaign | member | A (f64) | med err | max err "
          "| worst param |")
    print("|---|---|---|---|---|---|---|")
    for i, r in enumerate(rows):
        print(f"| {i + 1} | {r['tag']} | {r['member']} | {r['A']:.4g} "
              f"| {100 * r['med']:.1f}% | {100 * r['mx']:.0f}% "
              f"| {r['worst']} |")
    # one-line verdict: does every member of the first-listed campaign
    # outrank every member of the others?
    first = argv[1].split("=", 1)[0]
    a1 = max(r["A"] for r in rows if r["tag"] == first)
    others = [r["A"] for r in rows if r["tag"] != first]
    if others:
        ok = a1 < min(others)
        print(f"\nordering: every {first} member "
              f"{'BELOW' if ok else 'NOT below'} every other member "
              f"(max {first} A = {a1:.4g} vs min other A = "
              f"{min(others):.4g})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
