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

# Batch-dimension bisection of the f64 polish WORKER crash (round-4,
# VERDICT r3 #4): the full 18-param K=3 N=6001 polish program crashes
# the TPU worker deterministically at its first dispatch at ensemble
# B=6 and runs clean at B=4 (CLAUDE.md round-3 gotchas; the mitigation
# is workflow.safe_polish_batch). Each case runs ONE vmapped bounded
# f64 ladder dispatch at the given B — a worker crash/hang surfaces as
# rc!=0 or timeout in the parent table. N is scaled down first
# (N=1501) to see whether the envelope is B-driven or (B x N)-driven;
# the N=6001 rows reproduce the campaign shape. Run with
# --batch-bisect on the TPU testbed (long: each N=6001 case compiles
# minutes on 1 core; the persistent JAX cache amortizes repeats).
BATCH_CASES = [
    # (name, N_data, B, maxiter)
    ("polish_N1501_B4", 1501, 4, 30),
    ("polish_N1501_B6", 1501, 6, 30),
    ("polish_N1501_B8", 1501, 8, 30),
    ("polish_N6001_B4", 6001, 4, 30),
    ("polish_N6001_B5", 6001, 5, 30),
    ("polish_N6001_B6", 6001, 6, 30),
    ("polish_N6001_B8", 6001, 8, 30),
]

BATCH_CHILD = r'''
import json, sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
name, N, B, maxiter = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), \
    int(sys.argv[4])
from varanneal_tpu.models import nakl, NAKL_P_TRUE, nakl_param_boxes
from varanneal_tpu.twin import nakl_twin
from varanneal_tpu.ops import build_spec, make_action
from varanneal_tpu.opt import LBFGSOptions
from varanneal_tpu.anneal import run_ladder
from varanneal_tpu.api import build_bounds
# the campaign polish shape: 18 estimated params (fix Cm), SH, stim,
# log-tau/log-g estimation scale, subspace bounded L-BFGS-B
pidx = list(range(1, 19))
pb, LOG_IDX = nakl_param_boxes(pidx, log_tau=True, log_g=True)
P = np.asarray(NAKL_P_TRUE, np.float64).copy()
P[list(LOG_IDX)] = np.log(P[list(LOG_IDX)])
_log = jnp.asarray(LOG_IDX)
def model_f(t, x, p):
    pp, st = p if isinstance(p, tuple) else (p, None)
    pl = jnp.asarray(pp).at[..., _log].set(jnp.exp(jnp.asarray(pp)[..., _log]))
    return nakl(t, x, pl if st is None else (pl, st))
tw = nakl_twin(N=N, dt=0.04, sigma=1.0, seed=7, seg=75)
spec = build_spec(model_f, 4, tw["V"], tw["t"], [0], 1.0,
                  disc="SimpsonHermite", P=P, pidx=pidx, stim=tw["stim"])
action, parts = make_action(spec)
bounds = [(-150., 70.), (0., 1.), (0., 1.), (0., 1.)] + pb
lo, hi = build_bounds(spec, bounds, np.float64)
rf0 = np.ascontiguousarray(np.broadcast_to(
    1e-5 * np.array([1.0, 1e7, 1e7, 1e7]), (spec.N_f - 1, 4)))
rng = np.random.default_rng(3)
V_f = np.interp(np.arange(spec.N_f) / 2.0, np.arange(N), tw["V"][:, 0])
xps = []
for _ in range(B):
    pe = [rng.uniform(*b) for b in pb]
    gates = [np.clip(0.5 + rng.normal(0, 0.1, spec.N_f), 0, 1)
             for _ in range(3)]
    xps.append(np.concatenate(
        [np.column_stack([V_f] + gates).ravel(), pe]))
xp = jnp.asarray(np.stack(xps))
opts = LBFGSOptions(maxiter=maxiter, m=5, pgtol=1e-10, ftol=1e-14,
                    bounded_algo="subspace")
fn = jax.jit(jax.vmap(lambda z: run_ladder(
    action, parts, z, jnp.arange(40.0, 41.0), jnp.asarray(rf0), 1.6,
    opts=opts, lower=jnp.asarray(lo), upper=jnp.asarray(hi),
    store_paths=False)))
r = fn(xp)
print("A", float(np.asarray(r.A).min()))          # host barrier
print("CHILD_OK", name)
'''

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

def _run_child(results, name, cmd, timeout):
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
        ok = "CHILD_OK" in p.stdout
        tailmsg = (p.stdout + p.stderr).strip().splitlines()[-1][:160] \
            if not ok and (p.stdout + p.stderr).strip() else ""
        results[name] = {"ok": ok, "rc": p.returncode,
                         "tail": "" if ok else tailmsg}
    except subprocess.TimeoutExpired:
        results[name] = {"ok": False, "rc": -9,
                         "tail": f"timeout {timeout}s"}
    print(f"{name:28s} {'OK' if results[name]['ok'] else 'CRASH/FAIL':10s}"
          f" rc={results[name]['rc']} {results[name]['tail']}",
          flush=True)


def _wait_worker(max_wait=5400):
    """Worker-recovery discipline (CLAUDE.md): after a crash case the
    TPU worker can take 20-70 min to reconnect; probe in a fresh child
    until a trivial dispatch succeeds so the NEXT case measures the
    kernel, not the outage."""
    import time
    t0 = time.time()
    probe = ("import jax, jax.numpy as jnp; "
             "assert float(jnp.ones((8, 8)).sum()) == 64.0")
    while time.time() - t0 < max_wait:
        try:
            p = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=300)
            if p.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# worker down {int(time.time() - t0)}s; waiting",
              flush=True)
        time.sleep(120)
    return False


def main():
    results = {}
    batch_mode = "--batch-bisect" in sys.argv
    if batch_mode:
        for name, N, Bn, maxiter in BATCH_CASES:
            if not _wait_worker():
                results[name] = {"ok": False, "rc": -2,
                                 "tail": "worker never recovered"}
                continue
            cmd = [sys.executable, "-c", BATCH_CHILD, name, str(N),
                   str(Bn), str(maxiter)]
            _run_child(results, name, cmd, 3600)
        path = "/tmp/f64_batch_bisect.json"
    else:
        for name, model, disc, N, grad, remat in CASES:
            cmd = [sys.executable, "-c", CHILD, name, model, disc,
                   str(N), "1" if grad else "0", "1" if remat else "0"]
            _run_child(results, name, cmd, 900)
        path = "/tmp/f64_crash_repro.json"
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
