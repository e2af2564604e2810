"""Minimal-repro matrix for the f64 NaKL-SimpsonHermite TPU compiler crash
(VERDICT r02 next-round #3a; CLAUDE.md measured gotchas).

Each case runs in a SUBPROCESS (a compiler crash takes the process down);
the parent records compile-or-crash per case and prints a table. Run on the
TPU testbed:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/f64_crash_repro.py
"""
import json
import os
import subprocess
import sys

CASES = [
    # (name, model, disc, N_data, grad, remat)
    ("nakl_sh_grad_N3001", "nakl", "SimpsonHermite", 3001, True, False),
    ("nakl_sh_grad_N751", "nakl", "SimpsonHermite", 751, True, False),
    ("nakl_sh_grad_N101", "nakl", "SimpsonHermite", 101, True, False),
    ("nakl_sh_grad_N31", "nakl", "SimpsonHermite", 31, True, False),
    ("nakl_sh_fwd_N751", "nakl", "SimpsonHermite", 751, False, False),
    ("nakl_trap_grad_N751", "nakl", "trapezoid", 751, True, False),
    ("l96_sh_grad_N751", "l96", "SimpsonHermite", 751, True, False),
    ("nakl_sh_grad_N751_remat", "nakl", "SimpsonHermite", 751, True, True),
]

CHILD = r'''
import json, sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
name, model, disc, N, grad, remat = sys.argv[1:7]
N = int(N); grad = grad == "1"; remat = remat == "1"
from varanneal_tpu.ops import build_spec, make_action
if model == "nakl":
    from varanneal_tpu.models import nakl, NAKL_P_TRUE
    from varanneal_tpu.twin import nakl_twin
    tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=7, seg=max(4, N // 40))
    spec = build_spec(nakl, 4, tw["V"], tw["t"], [0], 1.0, disc=disc,
                      P=np.asarray(NAKL_P_TRUE), pidx=[1, 2, 3, 4, 5],
                      stim=tw["stim"])
else:
    from varanneal_tpu.models import lorenz96
    rng = np.random.default_rng(0)
    t = 0.025 * np.arange(N)
    spec = build_spec(lorenz96, 4, rng.normal(size=(N, 2)), t, [0, 2], 4.0,
                      disc=disc, P=np.array([8.17]), pidx=[0])
action, _ = make_action(spec)
if remat:
    action = jax.checkpoint(action)
fn = jax.value_and_grad(action) if grad else action
fn = jax.jit(fn)
rng = np.random.default_rng(1)
xp = jnp.asarray(rng.normal(size=spec.n_dof))
out = fn(xp, jnp.asarray(1e-3))
jax.block_until_ready(out)
print("CHILD_OK", name)
'''

def main():
    results = {}
    for case in CASES:
        name, model, disc, N, grad, remat = case
        cmd = [sys.executable, "-c", CHILD, name, model, disc, str(N),
               "1" if grad else "0", "1" if remat else "0"]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=900)
            ok = "CHILD_OK" in p.stdout
            tailmsg = (p.stdout + p.stderr).strip().splitlines()[-1][:160] \
                if not ok and (p.stdout + p.stderr).strip() else ""
            results[name] = {"ok": ok, "rc": p.returncode,
                             "tail": "" if ok else tailmsg}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "rc": -9, "tail": "timeout 900s"}
        print(f"{name:28s} {'OK' if results[name]['ok'] else 'CRASH/FAIL':10s}"
              f" rc={results[name]['rc']} {results[name]['tail']}",
              flush=True)
    with open("/tmp/f64_crash_repro.json", "w") as fh:
        json.dump(results, fh, indent=1)

if __name__ == "__main__":
    main()
