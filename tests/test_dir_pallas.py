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
