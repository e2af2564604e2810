"""Fused-Pallas L-BFGS direction (kernels/dir_pallas.py) must equal the
XLA compact-form direction (itself pinned to the two-loop recursion by
tests/test_lbfgs_compact.py) for every history state, unbatched and
vmapped, and end-to-end inside the solver."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu.opt import lbfgs_minimize, LBFGSOptions
from varanneal_tpu.opt.lbfgs import _compact_dir
from varanneal_tpu.kernels import dir_pallas
from varanneal_tpu.kernels.dir_pallas import compact_dir_pallas


@pytest.fixture(autouse=True)
def _interpret():
    dir_pallas.set_interpret(True)
    yield
    dir_pallas.set_interpret(False)


def _random_history(rng, m, hlen, head, n):
    H = np.zeros((2 * m, n), np.float32)
    for j in range(hlen):
        slot = (head - hlen + j) % m
        s = rng.normal(size=n)
        y = rng.normal(size=n) * 0.3 + s
        H[slot], H[m + slot] = s, y
    return jnp.asarray(H)


@pytest.mark.parametrize("hlen", [0, 1, 3, 5])
@pytest.mark.parametrize("head", [0, 2])
def test_matches_compact(hlen, head):
    rng = np.random.default_rng(hlen * 10 + head)
    m, n = 5, 37
    H = _random_history(rng, m, hlen, head, n)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    hd, hl = jnp.asarray(head), jnp.asarray(hlen)
    d_ref = np.asarray(_compact_dir(g, H, None, hd, hl, m, jnp.float32))
    d_pl = np.asarray(compact_dir_pallas(g, H, hd, hl))
    np.testing.assert_allclose(d_pl, d_ref, rtol=2e-5, atol=2e-6)


def test_matches_compact_vmapped():
    rng = np.random.default_rng(7)
    m, n, B = 5, 150, 4
    heads = [0, 1, 3, 4]
    hlens = [0, 2, 5, 4]
    H = jnp.stack([_random_history(rng, m, hl, hd, n)
                   for hd, hl in zip(heads, hlens)])
    g = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    hd = jnp.asarray(heads)
    hl = jnp.asarray(hlens)
    d_ref = jax.vmap(
        lambda gi, Hi, a, b: _compact_dir(gi, Hi, None, a, b, m,
                                          jnp.float32))(g, H, hd, hl)
    d_pl = jax.vmap(compact_dir_pallas)(g, H, hd, hl)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=2e-5, atol=2e-6)


def _ref_step(m, H, x_old, x_new, g_old, g_new, head, hlen, ls_ok):
    """Plain-NumPy reference for fused_step: the generic solver body's
    history update + termination scalars + next compact direction."""
    sv, yv = x_new - x_old, g_new - g_old
    sy = float(sv @ yv)
    good = (bool(ls_ok) and sy > 1e-10 * np.linalg.norm(sv)
            * np.linalg.norm(yv) and sy > 0)
    H2 = np.array(H)
    head2, hlen2 = head, hlen
    if good:
        H2[head], H2[m + head] = sv, yv
        head2, hlen2 = (head + 1) % m, min(hlen + 1, m)
    d = np.asarray(_compact_dir(jnp.asarray(g_new), jnp.asarray(H2),
                                None, jnp.asarray(head2),
                                jnp.asarray(hlen2), m, jnp.float32))
    if not (g_new @ d < 0 and np.isfinite(g_new @ d)):
        d = -g_new
    return (H2, d, good, np.max(np.abs(g_new)), np.sum(np.abs(g_new)),
            head2, hlen2)


@pytest.mark.parametrize("head,hlen,ls_ok,flat_step", [
    (0, 0, True, False), (3, 3, True, False), (2, 5, True, False),
    (2, 5, False, False), (1, 4, True, True)])
def test_fused_step_matches_reference(head, hlen, ls_ok, flat_step):
    rng = np.random.default_rng(head * 7 + hlen)
    m, n = 5, 300
    n_pad, rows = 384, 16
    H = np.asarray(_random_history(rng, m, hlen, head, n))
    x_old = rng.normal(size=n).astype(np.float32)
    g_old = rng.normal(size=n).astype(np.float32)
    if flat_step:   # sy ~ 0: the curvature gate must reject the pair
        x_new, g_new = x_old + 1e-12, g_old.copy()
    else:
        x_new = (x_old + 0.1 * rng.normal(size=n)).astype(np.float32)
        g_new = (g_old + 0.1 * rng.normal(size=n)).astype(np.float32)
    A = np.zeros((rows, n_pad), np.float32)
    A[:2 * m, :n], A[2 * m, :n] = H, g_old
    A2, d, good, pgn, g1, head2, hlen2 = dir_pallas.fused_step(
        m, jnp.asarray(A), jnp.asarray(x_old), jnp.asarray(x_new),
        jnp.asarray(g_old), jnp.asarray(g_new),
        jnp.asarray(head, jnp.int32), jnp.asarray(hlen, jnp.int32),
        jnp.asarray(ls_ok))
    rH2, rd, rgood, rpgn, rg1, rh2, rl2 = _ref_step(
        m, H, x_old, x_new, g_old, g_new, head, hlen, ls_ok)
    assert bool(good) == rgood
    assert (int(head2), int(hlen2)) == (rh2, rl2)
    np.testing.assert_allclose(np.asarray(A2)[:2 * m, :n], rH2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A2)[2 * m, :n], g_new, rtol=1e-6)
    np.testing.assert_allclose(float(pgn), rpgn, rtol=1e-6)
    np.testing.assert_allclose(float(g1), rg1, rtol=1e-5)
    scale = np.abs(rd).max() + 1e-30
    assert (np.abs(np.asarray(d)[:n] - rd) / scale).max() < 2e-5


def test_fused_solver_vmapped_matches_compact():
    """Lockstep vmapped members through the fused loop must track the
    generic compact loop (the ladder's execution mode)."""
    rng = np.random.default_rng(3)
    n, B = 24, 3
    M = rng.normal(size=(n, n))
    Q = (M @ M.T + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(B, n)).astype(np.float32)

    def solve(direction):
        def one(bi):
            vag = jax.value_and_grad(
                lambda x: 0.5 * x @ (Q @ x) - bi @ x)
            return lbfgs_minimize(
                vag, jnp.zeros(n, jnp.float32),
                opts=LBFGSOptions(maxiter=300, pgtol=1e-6, ftol=0.0,
                                  m=5, direction=direction))
        return jax.vmap(one)(jnp.asarray(b))

    rp, rc = solve("compact_pallas"), solve("compact")
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rc.x),
                               rtol=5e-4, atol=5e-5)
    xstar = np.linalg.solve(Q, b.T).T
    np.testing.assert_allclose(np.asarray(rp.x), xstar, rtol=2e-3,
                               atol=2e-4)


def test_solver_end_to_end_pallas_direction():
    rng = np.random.default_rng(0)
    n = 30
    M = rng.normal(size=(n, n))
    Q = (M @ M.T + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)

    def f(x):
        return 0.5 * x @ (Q @ x) - b @ x

    vag = jax.value_and_grad(f)
    xstar = np.linalg.solve(Q, b)
    res = lbfgs_minimize(
        vag, jnp.zeros(n, jnp.float32),
        opts=LBFGSOptions(maxiter=500, pgtol=1e-5, ftol=1e-12, m=5,
                          direction="compact_pallas"))
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=2e-4,
                               atol=2e-4)
