"""va_nnet-equivalent tests: independent-oracle action parity + end-to-end
network training via annealing (SURVEY.md §3.4 semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from varanneal_tpu import nnet
from varanneal_tpu.nnet import nnet_action_factory, forward


def oracle_nnet_action(structure, U, Y, X, W, b, RM_in, RM_out, rf,
                       act, act_out, clamp_input=False):
    """Straight-line NumPy oracle for the nnet action (independent code)."""
    L = len(structure)
    M = U.shape[0]
    Xs = list(X)
    me = np.sum(np.asarray(RM_out) * (Xs[-1] - Y) ** 2)
    if not clamp_input:
        me += np.sum(np.asarray(RM_in) * (Xs[0] - U) ** 2)
    n_me = M * ((0 if clamp_input else structure[0]) + structure[-1])
    me /= n_me
    fe = 0.0
    rf = np.asarray(rf)
    for l in range(L - 1):
        a = act_out if l == L - 2 else act
        pred = a(Xs[l] @ np.asarray(W[l]).T + np.asarray(b[l]))
        r = Xs[l + 1] - pred
        w = float(rf) if rf.ndim == 0 else float(rf[l])
        fe += np.sum(w * r * r)
    fe /= M * sum(structure[1:])
    return me + fe, me, fe


@pytest.mark.parametrize("clamp_input", [False, True])
@pytest.mark.parametrize("rf_kind", ["scalar", "perlayer"])
def test_nnet_action_parity(clamp_input, rf_kind):
    rng = np.random.default_rng(0)
    structure = (3, 5, 4, 2)
    M = 7
    U = rng.normal(size=(M, 3))
    Y = rng.normal(size=(M, 2))
    X = [rng.normal(size=(M, n)) for n in structure]
    W = [rng.normal(size=(structure[i + 1], structure[i]))
         for i in range(3)]
    b = [rng.normal(size=(structure[i + 1],)) for i in range(3)]
    rf = 0.37 if rf_kind == "scalar" else rng.uniform(0.1, 1.0, size=3)
    RM_in, RM_out = 2.0, rng.uniform(0.5, 2.0, size=2)

    action, parts, pack, unravel = nnet_action_factory(
        structure, jnp.tanh, lambda z: z, U, Y, RM_in, RM_out,
        clamp_input=clamp_input)
    Xd = X[1:] if clamp_input else X
    XP = pack({"X": Xd, "W": W, "b": b})
    A_j, me_j, fe_j = [float(v) for v in parts(XP, jnp.asarray(rf))]
    X_oracle = [U] + X[1:] if clamp_input else X
    A_o, me_o, fe_o = oracle_nnet_action(
        structure, U, Y, X_oracle, W, b, RM_in, RM_out, rf,
        np.tanh, lambda z: z, clamp_input=clamp_input)
    assert A_j == pytest.approx(A_o, rel=1e-12)
    assert me_j == pytest.approx(me_o, rel=1e-12)
    assert fe_j == pytest.approx(fe_o, rel=1e-12)

    # grad check vs central differences of the oracle
    g = np.asarray(jax.grad(action)(XP, jnp.asarray(rf)))
    v = rng.normal(size=XP.shape[0])
    v /= np.linalg.norm(v)
    eps = 1e-6

    def o(z):
        t = unravel(jnp.asarray(z))
        Xo = [np.asarray(x) for x in t["X"]]
        if clamp_input:
            Xo = [U] + Xo
        return oracle_nnet_action(
            structure, U, Y, Xo, [np.asarray(w) for w in t["W"]],
            [np.asarray(x) for x in t["b"]], RM_in, RM_out, rf,
            np.tanh, lambda z: z, clamp_input=clamp_input)[0]

    fd = (o(np.asarray(XP) + eps * v) - o(np.asarray(XP) - eps * v)) / (2 * eps)
    assert float(g @ v) == pytest.approx(fd, rel=1e-6, abs=1e-10)


def test_nnet_anneal_end_to_end():
    """Teacher-student: anneal a 1-8-1 tanh net onto samples of a smooth
    function; at high β the annealed net must agree with plain forward
    propagation of its own weights, and fit the data."""
    rng = np.random.default_rng(3)
    M = 24
    U = np.linspace(-1, 1, M)[:, None]
    Y = np.sin(2.5 * U) + 0.3 * U

    ann = nnet.Annealer()
    ann.set_structure([1, 8, 1])
    ann.set_activation("tanh")
    ann.set_input_data(U)
    ann.set_output_data(Y)
    ann.anneal(alpha=2.0, beta_array=np.arange(24), RM=1.0, RF0=1e-3,
               opt_args=dict(maxiter=800, gtol=1e-9), seed=1)

    assert np.all(np.isfinite(ann.A_array))
    # FE/RF (the raw residual size) must collapse over the ladder:
    rf_arr = 1e-3 * 2.0 ** ann.beta_array
    resid = ann.fe_array / rf_arr
    assert resid[-1] < 1e-7
    # self-consistency at high beta: annealed output layer ≈ forward prop
    Xs = ann.activations_at(-1)
    pred = ann.predict(U, -1)
    # finite-β: layer residuals (rms ~1e-5) amplify through the weights,
    # so self-consistency is loose-tolerance, not exact
    np.testing.assert_allclose(Xs[-1], pred, atol=2e-2)
    # and the trained net fits the teacher
    rmse = np.sqrt(np.mean((pred - Y) ** 2))
    assert rmse < 0.1, rmse
    # ME grows as the transfer constraint hardens (β=0 copies data into
    # activations freely) but must stay at fit-quality scale
    assert ann.me_array[-1] < 1e-4


def test_nnet_clamped_input_and_bounds():
    rng = np.random.default_rng(5)
    M = 12
    U = rng.normal(size=(M, 2))
    Y = (U[:, :1] * U[:, 1:]) + 0.1
    ann = nnet.Annealer()
    ann.set_structure([2, 6, 1])
    ann.set_activation("tanh")
    ann.set_input_data(U)
    ann.set_output_data(Y)
    ann.anneal(alpha=2.0, beta_array=np.arange(12), RM=1.0, RF0=1e-2,
               clamp_input=True, bounds_W=(-3.0, 3.0),
               opt_args=dict(maxiter=400), seed=2)
    W, b = ann.weights_at(-1)
    for w in W:
        assert np.all(np.abs(w) <= 3.0 + 1e-12)
    # clamped: input activations are exactly the data
    Xs = ann.activations_at(-1)
    np.testing.assert_allclose(Xs[0], U, rtol=0, atol=0)
    assert np.all(np.isfinite(ann.A_array))
