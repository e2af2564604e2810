"""Model-level checks (lorenz63 vs independent NumPy) and example-script
smoke runs through the real CLI surface."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from varanneal_tpu.models import lorenz63, lorenz96


def test_lorenz63_vs_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3))
    p = np.array([10.0, 28.0, 8.0 / 3.0])
    got = np.asarray(lorenz63(0.0, jnp.asarray(x), jnp.asarray(p)))
    want = np.stack([
        p[0] * (x[:, 1] - x[:, 0]),
        x[:, 0] * (p[1] - x[:, 2]) - x[:, 1],
        x[:, 0] * x[:, 1] - p[2] * x[:, 2],
    ], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # time-dependent parameter form broadcasts
    p_td = np.tile(p, (7, 1))
    got_td = np.asarray(lorenz63(0.0, jnp.asarray(x), jnp.asarray(p_td)))
    np.testing.assert_allclose(got_td, want, rtol=1e-12)


def test_lorenz96_conserves_under_symmetry():
    """Rotational symmetry: rolling the state rolls the tendency."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 10))
    f = np.asarray(lorenz96(0.0, jnp.asarray(x), 8.0))
    f_rolled = np.asarray(lorenz96(0.0, jnp.asarray(np.roll(x, 3, 1)), 8.0))
    np.testing.assert_allclose(np.roll(f, 3, 1), f_rolled, rtol=1e-12)


def test_example_lorenz96_d20_small_runs():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    r = subprocess.run(
        [sys.executable, "examples/lorenz96_d20.py", "--small",
         "--maxiter", "150"],
        capture_output=True, text=True, env=env, timeout=420,
        cwd=os.getcwd())
    assert r.returncode == 0, r.stderr[-2000:]
    assert "F =" in r.stdout
    for f in ("l96_paths.npy", "l96_params.npy", "l96_action_errors.dat"):
        assert os.path.exists(f)
        os.unlink(f)


def test_example_lorenz96_d100_ensemble_small_runs(tmp_path):
    """The d100 example's --ninit path: vmapped library ladder + action
    ranking at the --small config (D=40), through the chunked checkpoint
    facade."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    r = subprocess.run(
        [sys.executable, "examples/lorenz96_d100_sh.py", "--small",
         "--ninit", "3", "--maxiter", "40",
         "--ckpt", str(tmp_path / "d100_ens.npz")],
        capture_output=True, text=True, env=env, timeout=420,
        cwd=os.getcwd())
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ensemble B=3" in r.stdout
    assert "min-action member" in r.stdout


def test_colpitts_vs_numpy():
    from varanneal_tpu.models import colpitts, COLPITTS_P_TRUE
    from varanneal_tpu.twin import colpitts_np
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 3))
    p = np.asarray(COLPITTS_P_TRUE)
    got = np.asarray(colpitts(0.0, jnp.asarray(x), jnp.asarray(p)))
    want = np.stack([colpitts_np(xi, p) for xi in x])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_colpitts_estimation_e2e():
    """Small twin experiment through the facade: observing x1 of the
    chaotic Colpitts attractor recovers eta (the loop-gain parameter)."""
    from varanneal_tpu.api import Annealer
    from varanneal_tpu.models import colpitts, COLPITTS_P_TRUE
    from varanneal_tpu.twin import colpitts_twin

    tw = colpitts_twin(N_data=161, dt=0.05, sigma=0.02)
    ann = Annealer()
    ann.set_model(colpitts, 3)
    ann.set_data(tw["Y"], t=tw["t"])
    rng = np.random.default_rng(4)
    X0 = rng.normal(size=(161, 3))
    P0 = np.asarray(COLPITTS_P_TRUE).copy()
    P0[3] = 4.0                       # perturb eta; estimate it
    ann.anneal(X0, P0, 1.5, np.arange(25.0), tw["RM"], 1e-4 * tw["RM"],
               tw["Lidx"], Pidx=[3],
               opt_args=dict(maxiter=400, gtol=1e-9))
    eta = float(ann.minpaths_P[-1][0])
    assert abs(eta - COLPITTS_P_TRUE[3]) / COLPITTS_P_TRUE[3] < 0.05, eta
    # estimated path tracks the unobserved components too
    X = ann.minpaths_X[-1]
    rmse_unobs = np.sqrt(np.mean((X[:, 1] - tw["traj"][:, 1]) ** 2))
    assert rmse_unobs < 0.5 * tw["traj"][:, 1].std(), rmse_unobs


def test_example_nakl_anchored_flow_runs(tmp_path):
    """The flagship anchored-ensemble recipe end-to-end through the real
    CLI: phase 1 with per-member own-draw MAP anchors (extended decision
    vectors, per-member bounds), save, then the --load path strips the
    anchors and runs the prior-free f64 polish. Mirrors the campaign
    runners (.campaign/run_clampH.sh + run_clampG_polish.sh) at tiny
    shapes."""
    save = str(tmp_path / "anch.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    common = [sys.executable, "examples/nakl_ensemble.py"]
    r = subprocess.run(
        common + ["--all-params", "--fix-cm", "--ninit", "2",
                  "--record-n", "301", "--nbeta", "2", "--log-tau",
                  "--log-g", "--gates-own-ss", "--param-prior", "10",
                  "--prior-own-draw", "--maxiter", "3", "--repeats", "1",
                  "--chunk", "50", "--no-polish", "--save", save,
                  "--seed", "1"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.getcwd())
    assert r.returncode == 0, r.stderr[-2000:]
    assert "center=own draw" in r.stdout
    sd = np.load(save)
    assert bool(sd["prior_own_draw"])
    n_par = 18
    # extended layout: anchor centers ride as trailing coords
    assert sd["xp"].shape[1] > n_par
    anchors = sd["xp"][:, -n_par:]
    assert not np.allclose(anchors[0], anchors[1])   # per-member centers
    r2 = subprocess.run(
        common + ["--load", save, "--polish-top", "1",
                  "--polish-maxiter", "3", "--polish-repeats", "1",
                  "--chunk", "50"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.getcwd())
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "saved polished estimate" in r2.stdout
    pol = np.load(save.replace(".npz", "_polished.npz"))
    # polished estimate is back on the STANDARD layout (anchors stripped)
    assert pol["XP"].shape[-1] == sd["xp"].shape[1] - n_par
    assert pol["p_est"].shape == (n_par,)


def test_example_nakl_tight_box_prior(tmp_path):
    """--box-shrink: the literature-style physiological prior — kinetic
    and reversal boxes shrink around an offset-jittered center near
    truth, conductances keep the wide box, and the polish phase rebuilds
    the identical boxes from the saved meta. Mirrors the tightbox
    campaign at tiny shapes."""
    from varanneal_tpu.models import NAKL_P_TRUE
    save = str(tmp_path / "tight.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    common = [sys.executable, "examples/nakl_ensemble.py"]
    r = subprocess.run(
        common + ["--all-params", "--fix-cm", "--ninit", "2",
                  "--record-n", "301", "--nbeta", "2", "--log-tau",
                  "--log-g", "--gates-own-ss", "--param-prior", "10",
                  "--prior-own-draw", "--box-shrink", "6",
                  "--maxiter", "3", "--repeats", "1", "--chunk", "50",
                  "--no-polish", "--save", save, "--seed", "1"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.getcwd())
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TIGHT-BOX PRIOR" in r.stdout
    sd = np.load(save)
    assert float(sd["box_shrink"]) == 6.0
    n_par = 18
    # own-draw layout: the trailing coords are the DRAWS themselves.
    # Pidx = 1..18; conductances gNa/gK/gL sit at positions 0/2/4 and
    # must span the WIDE box, kinetics must sit inside the shrunk box
    # (center within 0.5 half-widths of truth => within (1+0.5)/(2*6)
    # of a wide-box width from truth in estimation scale).
    draws = sd["xp"][:, -n_par:].astype(np.float64)
    from varanneal_tpu.models import NAKL_PBOUNDS
    wide = [NAKL_PBOUNDS[j] for j in range(1, 19)]
    log_idx_full = {9, 10, 13, 14, 17, 18, 1, 3, 5}
    for col, pj in enumerate(range(1, 19)):
        b0, b1 = wide[col]
        tr = NAKL_P_TRUE[pj]
        if pj in log_idx_full:
            b0, b1, tr = np.log(b0), np.log(b1), np.log(tr)
        d = np.abs(draws[:, col] - tr) / (b1 - b0)
        if pj in (1, 3, 5):          # conductances: wide box kept
            continue
        assert np.all(d <= 1.5 / (2 * 6) + 1e-9), (pj, d)
    # the --load path reconstructs the same boxes (meta-driven)
    r2 = subprocess.run(
        common + ["--load", save, "--polish-top", "1",
                  "--polish-maxiter", "3", "--polish-repeats", "1",
                  "--chunk", "50"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.getcwd())
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "TIGHT-BOX PRIOR" in r2.stdout
    assert "saved polished estimate" in r2.stdout


def test_nakl_param_boxes_library():
    """nakl_param_boxes: the library home of the campaign boxes
    (wide, log-space groups, tight physiological prior) — properties
    plus bit-consistency with an archived real campaign
    (.campaign/data/tightbox16_facts.npz, whose saved draws were made
    inside the boxes the example built at campaign time)."""
    from varanneal_tpu.models import (
        nakl_param_boxes, NAKL_PBOUNDS, NAKL_P_TRUE, NAKL_TAU_IDX,
        NAKL_G_IDX)

    Pidx = list(range(1, 19))

    # wide, linear: exactly the module constants, no log indices
    pb, li = nakl_param_boxes(Pidx)
    assert li == ()
    assert pb == [NAKL_PBOUNDS[j] for j in Pidx]

    # log flags: the six timescales + three conductances go log-scale,
    # truth strictly inside every box either way
    pb, li = nakl_param_boxes(Pidx, log_tau=True, log_g=True)
    assert set(li) == set(NAKL_TAU_IDX) | set(NAKL_G_IDX)
    for (b0, b1), pi in zip(pb, Pidx):
        t = np.log(NAKL_P_TRUE[pi]) if pi in li else NAKL_P_TRUE[pi]
        assert b0 < t < b1, (pi, b0, t, b1)

    # tight-box prior: deterministic in seed, truth inside every box,
    # kept-wide coords untouched, shrunk widths <= wide/S
    S = 6.0
    pb1, li = nakl_param_boxes(Pidx, log_tau=True, log_g=True,
                               box_shrink=S, seed=3)
    pb2, _ = nakl_param_boxes(Pidx, log_tau=True, log_g=True,
                              box_shrink=S, seed=3)
    pb3, _ = nakl_param_boxes(Pidx, log_tau=True, log_g=True,
                              box_shrink=S, seed=4)
    assert pb1 == pb2 and pb1 != pb3
    wide, _ = nakl_param_boxes(Pidx, log_tau=True, log_g=True)
    for (b0, b1), (w0, w1), pi in zip(pb1, wide, Pidx):
        t = np.log(NAKL_P_TRUE[pi]) if pi in li else NAKL_P_TRUE[pi]
        assert w0 <= b0 < t < b1 <= w1, (pi, b0, t, b1)
        if pi in NAKL_G_IDX:
            assert (b0, b1) == (w0, w1)      # conductances stay wide
        else:
            assert (b1 - b0) <= (w1 - w0) / S + 1e-12

    # box_shrink_all shrinks the conductances too
    pba, _ = nakl_param_boxes(Pidx, log_tau=True, log_g=True,
                              box_shrink=S, box_shrink_all=True, seed=3)
    for (b0, b1), (w0, w1), pi in zip(pba, wide, Pidx):
        assert (b1 - b0) <= (w1 - w0) / S + 1e-12

    # archived-campaign consistency: every draw of the real tightbox16
    # run lies inside the boxes reconstructed from its saved meta
    facts = os.path.join(os.getcwd(), ".campaign", "data",
                         "tightbox16_facts.npz")
    if os.path.exists(facts):
        d = np.load(facts)
        pb, _ = nakl_param_boxes(
            Pidx, log_tau=bool(d["log_tau"]), log_g=bool(d["log_g"]),
            box_shrink=float(d["box_shrink"]),
            box_offset=float(d["box_offset"]),
            box_shrink_all=bool(d["box_shrink_all"]),
            seed=int(d["seed"]))
        lo = np.asarray([b[0] for b in pb])
        hi = np.asarray([b[1] for b in pb])
        draws = d["draws"].astype(np.float64)
        assert np.all(draws >= lo - 1e-9) and np.all(draws <= hi + 1e-9)
