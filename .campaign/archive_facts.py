"""Archive the FACTS of a campaign save into the repo (machine-loss
insurance: /tmp dies with the testbed VM, and this round lost two VMs
mid-campaign).

Copies every array EXCEPT the bulky state fields (xp/XP/xp_snap — the
decision vectors are ~MBs per member and reproducible by re-running the
runner) plus, for own-draw-anchored phase-1 saves, the per-member
parameter DRAWS (the anchor centers, i.e. the trailing n_par coords of
xp) and the per-member final parameter ESTIMATES — everything the
closing analyses (ordering tables, coverage, figures) need, at ~KBs.

Usage: python .campaign/archive_facts.py SRC.npz DEST.npz [--npar 18]
"""
import argparse

import numpy as np

BULKY = {"xp", "XP", "xp_snap"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("--npar", type=int, default=18)
    args = ap.parse_args()
    sd = np.load(args.src)
    out = {k: sd[k] for k in sd.files if k not in BULKY}
    n = args.npar
    if "xp" in sd.files:
        xp = sd["xp"]
        if "prior_own_draw" in sd.files and bool(sd["prior_own_draw"]):
            out["draws"] = xp[:, -n:]
            out["p_final"] = xp[:, -2 * n:-n]
        else:
            out["p_final"] = xp[:, -n:]
    if "XP" in sd.files and "p_est" not in out:
        out["p_est"] = sd["XP"][..., -n:]
    np.savez_compressed(args.dest, **out)
    import os
    print(f"{args.dest}: {os.path.getsize(args.dest)} bytes, "
          f"keys={sorted(out)}")


if __name__ == "__main__":
    main()
