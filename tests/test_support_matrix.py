"""Feature x engine/solver support matrix (varanneal_tpu/support.py):
every cell is pinned here, and the facade's actual behavior (forced
request -> served / clear error / warning fallback; auto -> never an
unsupported engine) is exercised for the rows where it differs."""

import numpy as np
import pytest

import jax.numpy as jnp

from varanneal_tpu.support import support_matrix, markdown_table
from varanneal_tpu.models import lorenz96
from varanneal_tpu.twin import lorenz96_twin
from varanneal_tpu.ops import build_spec
from varanneal_tpu.kernels.fe_pallas import select_action


EXPECT = {
    # feature -> (fe, ag, fused)
    "baseline (trapezoid f32 D=20)": ("served", "served", "served"),
    "large D (one-step, D=256)": ("served", "served", "served"),
    "box bounds (projection)": ("served", "served", "served"),
    "box bounds (explicit subspace)": ("served", "served", "fallback"),
    "SimpsonHermite": ("served", "served", "served"),
    "diag RF (N-1, D)": ("served", "served", "served"),
    "matrix RF (N-1, D, D)": ("error", "error", "fallback"),
    "time-dependent parameters": ("error", "error", "fallback"),
    "observation stride (dt_model)": ("served", "served", "served"),
    "non-uniform time grid": ("error", "error", "fallback"),
    # round-5: engine='ag' serves the in-kernel two-float reductions
    "compensated f32 sums": ("error", "served", "fallback"),
    "f64": ("served", "error", "fallback"),
    "multi-protocol joint estimation": ("n/a", "n/a", "n/a"),
    "campaign-length record (N=1001 SH)": ("served", "served",
                                           "served"),
    "large D fused (D=400, N=161)": ("served", "served", "served"),
}

# auto-column pins for the measured-win gates (round-5
# solve_preferred N_pad <= 1024; ag D >= 256)
EXPECT_AUTO = {
    "baseline (trapezoid f32 D=20)": "xla + fused",
    "large D (one-step, D=256)": "ag + fused",
    "campaign-length record (N=1001 SH)": "xla + generic",
    "large D fused (D=400, N=161)": "ag + fused",
    "box bounds (projection)": "xla + fused",
    "box bounds (explicit subspace)": "xla + generic",
}


def test_every_cell_pinned():
    rows = support_matrix()
    got = {r.feature: (r.fe, r.ag, r.fused) for r in rows}
    assert got == EXPECT
    auto = {r.feature: r.auto for r in rows}
    for k, v in EXPECT_AUTO.items():
        assert auto[k] == v, (k, auto[k])
    # the generated table renders every row
    md = markdown_table()
    for name in EXPECT:
        assert name in md


def test_auto_never_picks_unsupported():
    """Structural property: wherever a forced engine would error, the
    auto column resolves to xla + generic."""
    for r in support_matrix():
        if r.fe == "error" or r.ag == "error":
            assert r.auto.startswith("xla"), r
        if r.fused != "served":
            assert r.auto.endswith("generic"), r


def _spec(**kw):
    tw = lorenz96_twin(D=20, N_data=21, n_obs=8)
    P = kw.pop("P", np.array([4.0]))
    return build_spec(lorenz96, 20, tw["Y"], tw["t"], tw["Lidx"],
                      tw["RM"], disc="trapezoid", P=P, pidx=[0], **kw)


def test_forced_engine_clear_errors():
    """Round-4 contract: forcing an unsupported engine raises a CLEAR
    ValueError at build time (previously an opaque reshape TypeError
    from inside the kernel prep)."""
    spec_td = _spec(P=np.full((21, 1), 4.0))
    with pytest.raises(ValueError, match="pallas.*unsupported"):
        select_action(spec_td, np.float32(1.0), engine="pallas")
    with pytest.raises(ValueError, match="ag.*unsupported"):
        select_action(spec_td, np.float32(1.0), engine="ag")
    # rank-3 rf
    spec = _spec()
    rf3 = np.ones((3, 20, 20), np.float32)
    with pytest.raises(ValueError, match="unsupported"):
        select_action(spec, rf3, engine="pallas")
    with pytest.raises(ValueError, match="unsupported"):
        select_action(spec, rf3, engine="ag")
    # supported requests still build
    act, _ = select_action(spec, np.float32(1.0), engine="pallas")
    assert act.engine == "pallas"


def test_facade_time_dep_p_auto_falls_back():
    """Through the facade, a time-dependent-P problem on engine='auto'
    runs the XLA path end-to-end (the row's documented fallback)."""
    from varanneal_tpu import Annealer
    tw = lorenz96_twin(D=6, N_data=17, n_obs=3)
    an = Annealer()
    an.set_model(lorenz96, 6)
    an.set_data(tw["Y"], t=tw["t"])
    an.anneal(np.tile(tw["Y"].mean(), (17, 6)),
              np.full((17, 1), 7.0), 1.5, np.arange(3), tw["RM"],
              1e-4, tw["Lidx"], Pidx=[0], dtype=np.float32,
              track_paths=False, opt_args=dict(maxiter=10))
    assert np.all(np.isfinite(an.A_array))


def test_parity_table_not_drifted():
    """Round-5 (VERDICT r4 weak #1): the committed PARITY.md table must
    EQUAL the generated one — support.py's 'can never drift from the
    code' claim, made true. Regenerate with
    ``python benchmarks/support_matrix.py`` and paste between the
    SUPPORT_MATRIX markers whenever a predicate changes."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PARITY.md")) as fh:
        txt = fh.read()
    begin = txt.index("SUPPORT_MATRIX_BEGIN")
    begin = txt.index("\n", begin) + 1
    end = txt.index("<!-- SUPPORT_MATRIX_END -->")
    committed = txt[begin:end].strip()
    assert committed == markdown_table().strip(), (
        "PARITY.md support-matrix table drifted from "
        "support.markdown_table() — regenerate and re-paste")
