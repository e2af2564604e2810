"""Three-way cross-check: native C++ analytic action/gradient vs jax.grad
vs the NumPy oracle — three independent implementations of the same
contract (valib's gradient is hand-derived; it shares no code with either).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu import native
from varanneal_tpu.models import lorenz96
from varanneal_tpu.ops import build_spec, make_action
from tests.oracle import OracleProblem, lorenz96_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


@pytest.mark.parametrize("est_F", [True, False])
@pytest.mark.parametrize("stride", [1, 3])
def test_native_matches_jax_and_numpy(est_F, stride):
    rng = np.random.default_rng(0)
    D, N_data, L = 8, 17, 4
    dt_data = 0.025
    t = dt_data * np.arange(N_data)
    Y = rng.normal(size=(N_data, L))
    Lidx = [0, 2, 5, 6]
    rm, rf = 4.0, 3.7e-3
    dt_model = dt_data / stride if stride > 1 else None
    N = (N_data - 1) * stride + 1

    spec = build_spec(lorenz96, D, Y, t, Lidx, rm, disc="trapezoid",
                      P=np.array([8.17]), pidx=[0] if est_F else [],
                      dt_model=dt_model)
    orc = OracleProblem(lorenz96_np, D, Y, t, Lidx, rm, disc="trapezoid",
                        P=np.array([8.17]), pidx=[0] if est_F else [],
                        dt_model=dt_model)
    action, _ = make_action(spec)

    xp = rng.normal(size=spec.n_dof)
    A_nat, g_nat = native.l96_trap_action_grad(
        xp, N, D, Y, Lidx, stride, rm, rf, spec.dt,
        est_F=est_F, F_fixed=8.17)
    A_jax = float(action(jnp.asarray(xp), jnp.asarray(rf)))
    g_jax = np.asarray(jax.grad(action)(jnp.asarray(xp), jnp.asarray(rf)))
    A_np = orc.action(xp, rf)[0]

    assert A_nat == pytest.approx(A_jax, rel=1e-12)
    assert A_nat == pytest.approx(A_np, rel=1e-12)
    np.testing.assert_allclose(g_nat, g_jax, rtol=1e-10, atol=1e-14)


@pytest.mark.parametrize("est_F", [True, False])
@pytest.mark.parametrize("stride", [1, 2])
def test_native_sh_matches_jax_and_numpy(est_F, stride):
    """Hermite–Simpson 3-way parity (SURVEY.md §7 hard-part #4: the
    doubled grid / midpoint packing, now pinned by all three oracles
    like trapezoid — VERDICT r02 next-round #8)."""
    rng = np.random.default_rng(1)
    D, N_data, L = 8, 13, 4
    dt_data = 0.025
    t = dt_data * np.arange(N_data)
    Y = rng.normal(size=(N_data, L))
    Lidx = [0, 2, 5, 6]
    rm, rf = 4.0, 3.7e-3
    dt_model = dt_data / stride if stride > 1 else None
    N_base = (N_data - 1) * stride + 1
    N_f = 2 * N_base - 1

    spec = build_spec(lorenz96, D, Y, t, Lidx, rm, disc="SimpsonHermite",
                      P=np.array([8.17]), pidx=[0] if est_F else [],
                      dt_model=dt_model)
    assert spec.N_f == N_f
    orc = OracleProblem(lorenz96_np, D, Y, t, Lidx, rm,
                        disc="SimpsonHermite", P=np.array([8.17]),
                        pidx=[0] if est_F else [], dt_model=dt_model)
    action, _ = make_action(spec)

    xp = rng.normal(size=spec.n_dof)
    A_nat, g_nat = native.l96_sh_action_grad(
        xp, N_f, D, Y, Lidx, stride, rm, rf, spec.dt,
        est_F=est_F, F_fixed=8.17)
    A_jax = float(action(jnp.asarray(xp), jnp.asarray(rf)))
    g_jax = np.asarray(jax.jit(jax.grad(action))(jnp.asarray(xp),
                                                 jnp.asarray(rf)))
    A_np = orc.action(xp, rf)[0]

    assert A_nat == pytest.approx(A_jax, rel=1e-12)
    assert A_nat == pytest.approx(A_np, rel=1e-12)
    np.testing.assert_allclose(g_nat, g_jax, rtol=1e-10, atol=1e-14)


def test_native_gradient_is_analytic_not_fd():
    """The native gradient must be exact (matches jax.grad to near machine
    precision even where finite differences would lose digits)."""
    rng = np.random.default_rng(3)
    D, N_data = 6, 11
    t = 0.025 * np.arange(N_data)
    Y = rng.normal(size=(N_data, 2)) * 1e4     # large scale stresses FD
    Lidx = [0, 3]
    spec = build_spec(lorenz96, D, Y, t, Lidx, 4.0, disc="trapezoid",
                      P=np.array([8.17]), pidx=[0])
    action, _ = make_action(spec)
    xp = rng.normal(size=spec.n_dof) * 1e4
    A_nat, g_nat = native.l96_trap_action_grad(
        xp, N_data, D, Y, Lidx, 1, 4.0, 1e-3, spec.dt, est_F=True)
    g_jax = np.asarray(jax.grad(action)(jnp.asarray(xp), 1e-3))
    np.testing.assert_allclose(g_nat, g_jax, rtol=1e-12)
