"""Thin CLI runner: ``python -m varanneal_tpu CONFIG.json``.

The JSON config holds the AnnealConfig fields plus:
  "model":  one of the built-in model names ("lorenz96", "lorenz63", "colpitts",
            "nakl") with "D";
  "data":   {"file": "...", "stim_file": "...", "nstart": 0, "N": null}
            (reference set_data_fromfile semantics: column 0 = time);
  "X0":     optional .npy path for the initial path (default: zeros +
            init_to_data);
  "P0":     list of initial/fixed parameter values;
  "out":    output prefix for save_paths/save_params/save_action_errors.
"""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m varanneal_tpu")
    ap.add_argument("config", help="JSON config file")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    import varanneal_tpu
    from varanneal_tpu import models
    from varanneal_tpu.config import AnnealConfig

    with open(args.config) as fh:
        raw = json.load(fh)
    cfg = AnnealConfig.from_json(args.config)

    model_name = raw["model"]["name"]
    D = int(raw["model"]["D"])
    f = getattr(models, model_name)

    ann = varanneal_tpu.Annealer()
    ann.set_model(f, D)
    d = raw["data"]
    ann.set_data_fromfile(d["file"], stim_file=d.get("stim_file"),
                          nstart=int(d.get("nstart", 0)), N=d.get("N"))

    N_data = ann.data.shape[0]
    if "X0" in raw:
        X0 = np.load(raw["X0"])
    else:
        X0 = np.zeros((N_data, D))
    P0 = np.asarray(raw["P0"], dtype=np.float64)

    cfg.run(ann, X0, P0, verbose=True)

    out = raw.get("out", "va")
    ann.save_paths(f"{out}_paths.npy")
    ann.save_params(f"{out}_params.npy")
    ann.save_action_errors(f"{out}_action_errors.dat")
    print(f"[varanneal_tpu] wrote {out}_paths.npy {out}_params.npy "
          f"{out}_action_errors.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
