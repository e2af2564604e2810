"""Neural-network variational annealing — the ``va_nnet`` equivalent.

Reference semantics (``varanneal/va_nnet.py :: Annealer`` [H structure /
M details, SURVEY.md §2/§3.4]): train a feedforward network by treating layer
index as "time" — activations are states, weights/biases are parameters, the
layer-to-layer map is the dynamics. The measurement error couples input-layer
states to inputs and output-layer states to labels; the model error is the
layer-transfer residual, annealed from soft to hard:

    FE  = (1/N_fe) Σ_{m,l}  RF_l ⊙ (x^m_{l+1} − g_l(W_l x^m_l + b_l))²
    ME  = (1/N_me) Σ_m [ RM_in ⊙ (x^m_0 − u^m)² + RM_out ⊙ (x^m_L − y^m)² ]

Pinned normalizations (reference mount empty — [pinned-by-oracle], see
``tests/test_nnet.py``): N_me = M·(n_0 + n_out), N_fe = M·Σ_{l≥1} n_l.

TPU-native design: the ragged per-layer state/weight structure is a pytree
flattened with ``ravel_pytree`` (static treedef → one flat decision vector
for the shared L-BFGS/ladder machinery); the per-example dimension is
vmapped; layer matmuls batch over examples so they hit the MXU as
(M, n_l) @ (n_l, n_{l+1}) GEMMs.

Input-layer states may be soft-coupled via ME (default, matching the
reference's ME-at-both-ends shape) or hard-clamped (``clamp_input=True``).
"""

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from varanneal_tpu.anneal.ladder import run_ladder
from varanneal_tpu import io as vio
from varanneal_tpu.api import make_lbfgs_options, _STATUS_TO_SCIPY

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "linear": lambda z: z,
}


def nnet_action_factory(structure: Sequence[int], g: Callable,
                        g_out: Callable, U: np.ndarray, Y: np.ndarray,
                        RM_in, RM_out, *, clamp_input: bool = False,
                        dtype=np.float64):
    """Build (action, action_parts, pack, unpack) for an nnet VA problem.

    ``structure``: layer widths (n_0, ..., n_L). ``U``: (M, n_0) inputs;
    ``Y``: (M, n_L) targets. ``g``/``g_out``: hidden/output activations.
    ``RM_in``/``RM_out``: scalar or per-component (n_0,)/(n_L,) weights.

    The decision pytree is ``{"X": [per-layer (M, n_l) activations],
    "W": [(n_{l+1}, n_l)], "b": [(n_{l+1},)]}``; with ``clamp_input`` the
    input layer is removed from the decision variables entirely.
    """
    structure = tuple(int(n) for n in structure)
    L = len(structure)
    M = U.shape[0]
    U = jnp.asarray(U, dtype)
    Y = jnp.asarray(Y, dtype)
    RM_in = jnp.asarray(RM_in, dtype)
    RM_out = jnp.asarray(RM_out, dtype)

    n_me = M * ((0 if clamp_input else structure[0]) + structure[-1])
    n_fe = M * sum(structure[1:])

    def template():
        X = [jnp.zeros((M, n), dtype) for n in structure]
        if clamp_input:
            X = X[1:]
        W = [jnp.zeros((structure[i + 1], structure[i]), dtype)
             for i in range(L - 1)]
        b = [jnp.zeros((structure[i + 1],), dtype) for i in range(L - 1)]
        return {"X": X, "W": W, "b": b}

    _, unravel = ravel_pytree(template())

    def pack(tree):
        flat, _ = ravel_pytree(
            jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree))
        return flat

    def states(tree):
        X = list(tree["X"])
        if clamp_input:
            X = [U] + X
        return X

    def action_parts(XP, rf):
        tree = unravel(XP)
        X = states(tree)
        W, b = tree["W"], tree["b"]
        # measurement error at the two ends
        me = jnp.sum(RM_out * (X[-1] - Y) ** 2)
        if not clamp_input:
            me = me + jnp.sum(RM_in * (X[0] - U) ** 2)
        me = me / n_me
        # layer-transfer model error; rf scalar or per-layer (L-1,)
        rf = jnp.asarray(rf, XP.dtype)
        fe = jnp.zeros((), XP.dtype)
        for l in range(L - 1):
            act = g_out if l == L - 2 else g
            pred = act(X[l] @ W[l].T + b[l])
            r = X[l + 1] - pred
            w = rf if rf.ndim == 0 else rf[l]
            fe = fe + jnp.sum(w * r * r)
        fe = fe / n_fe
        return me + fe, me, fe

    def action(XP, rf):
        return action_parts(XP, rf)[0]

    return action, action_parts, pack, unravel


def forward(structure, g, g_out, W, b, U):
    """Plain forward propagation (the β→∞ limit of the annealed net)."""
    x = jnp.asarray(U)
    L = len(structure)
    for l in range(L - 1):
        act = g_out if l == L - 2 else g
        x = act(x @ jnp.asarray(W[l]).T + jnp.asarray(b[l]))
    return x


class Annealer:
    """va_nnet-compatible facade.

    Usage::

        ann = nnet.Annealer()
        ann.set_structure([2, 8, 1])
        ann.set_activation('tanh')            # hidden layers
        ann.set_input_data(U); ann.set_output_data(Y)
        ann.anneal(alpha=1.5, beta_array=range(30), RM=1.0, RF0=1e-4)
    """

    def __init__(self):
        self.structure = None
        self.g = ACTIVATIONS["tanh"]
        self.g_out = ACTIVATIONS["linear"]
        self.U = None
        self.Y = None
        self.annealing_run = False

    def set_structure(self, structure):
        self.structure = tuple(int(n) for n in structure)

    def set_activation(self, g, g_out=None):
        """Hidden activation (callable or name); output activation defaults
        to linear (reference regression setup [M])."""
        self.g = ACTIVATIONS[g] if isinstance(g, str) else g
        if g_out is not None:
            self.g_out = (ACTIVATIONS[g_out] if isinstance(g_out, str)
                          else g_out)

    def set_input_data(self, data_in):
        self.U = np.asarray(data_in, np.float64)

    def set_output_data(self, data_out):
        self.Y = np.asarray(data_out, np.float64)

    def anneal(self, alpha, beta_array, RM, RF0, *, W0=None, b0=None,
               X0=None, clamp_input=False, bounds_W=None, opt_args=None,
               adolcID=0, dtype=None, track_paths=True, seed=0,
               init_scale=0.1, checkpoint_path=None, checkpoint_every=10,
               resume=True):
        """Run the ladder. RM: scalar or (RM_in, RM_out) pair; RF0: scalar
        or per-layer (L-1,). W0/b0/X0: optional initial weights/biases/
        activations (defaults: Gaussian init_scale weights, zero biases,
        activations forward-propagated from the inputs).
        ``checkpoint_path``/``checkpoint_every``/``resume``: per-chunk
        ladder checkpointing to an .npz (anneal/checkpoint.py)."""
        if self.structure is None or self.U is None or self.Y is None:
            raise RuntimeError(
                "call set_structure / set_input_data / set_output_data first")
        del adolcID
        if dtype is None:
            dtype = (np.float64 if jax.config.jax_enable_x64
                     else np.float32)
        structure, L = self.structure, len(self.structure)
        M = self.U.shape[0]
        if self.U.shape[1] != structure[0]:
            raise ValueError("input data width != structure[0]")
        if self.Y.shape != (M, structure[-1]):
            raise ValueError("output data shape mismatch")

        if isinstance(RM, (tuple, list)):
            RM_in, RM_out = RM
        else:
            RM_in = RM_out = RM

        action, parts, pack, unravel = nnet_action_factory(
            structure, self.g, self.g_out, self.U, self.Y, RM_in, RM_out,
            clamp_input=clamp_input, dtype=dtype)
        self._unravel = unravel
        self._clamp_input = clamp_input

        rng = np.random.default_rng(seed)
        W = ([np.asarray(w) for w in W0] if W0 is not None else
             [init_scale * rng.normal(size=(structure[i + 1], structure[i]))
              for i in range(L - 1)])
        b = ([np.asarray(x) for x in b0] if b0 is not None else
             [np.zeros(structure[i + 1]) for i in range(L - 1)])
        if X0 is None:
            X = [self.U.copy()]
            for l in range(L - 1):
                act = self.g_out if l == L - 2 else self.g
                X.append(np.asarray(act(X[l] @ W[l].T + b[l])))
        else:
            X = [np.asarray(x) for x in X0]
        if clamp_input:
            X = X[1:]
        XP0 = pack({"X": X, "W": W, "b": b})

        rf0 = np.asarray(RF0, dtype)
        if rf0.ndim not in (0, 1) or (rf0.ndim == 1
                                      and rf0.shape != (L - 1,)):
            raise ValueError("RF0 must be scalar or per-layer (L-1,)")
        opts = make_lbfgs_options(opt_args, dtype)
        betas = np.asarray(beta_array, dtype=dtype)

        lower = upper = None
        if bounds_W is not None:
            # box bounds on weights/biases only; activations unbounded
            lo_t = jax.tree_util.tree_map(
                lambda a: jnp.full_like(jnp.asarray(a, dtype), -jnp.inf),
                {"X": X, "W": W, "b": b})
            hi_t = jax.tree_util.tree_map(
                lambda a: jnp.full_like(jnp.asarray(a, dtype), jnp.inf),
                {"X": X, "W": W, "b": b})
            wlo, whi = bounds_W
            lo_t["W"] = [jnp.full_like(jnp.asarray(w, dtype), wlo)
                         for w in W]
            hi_t["W"] = [jnp.full_like(jnp.asarray(w, dtype), whi)
                         for w in W]
            lower = np.asarray(pack(lo_t))
            upper = np.asarray(pack(hi_t))

        if checkpoint_path is not None:
            from varanneal_tpu.anneal.checkpoint import \
                run_ladder_checkpointed
            res = run_ladder_checkpointed(
                action, parts, jnp.asarray(XP0, dtype), betas, rf0,
                float(alpha), ckpt_path=checkpoint_path,
                save_every=checkpoint_every, lower=lower, upper=upper,
                opts=opts, store_paths=track_paths, resume=resume)
        else:
            @jax.jit
            def _ladder(xp0, bs):
                return run_ladder(action, parts, xp0, bs, rf0, float(alpha),
                                  lower=lower, upper=upper, opts=opts,
                                  store_paths=track_paths)

            res = _ladder(jnp.asarray(XP0, dtype), jnp.asarray(betas))
        res = jax.tree_util.tree_map(np.asarray, res)

        self.beta_array = np.asarray(beta_array)
        self.A_array = res.A
        self.me_array = res.ME
        self.fe_array = res.FE
        self.exitflags = _STATUS_TO_SCIPY[res.status]
        self.niter_array = res.niter
        self.nfev_array = res.nfev
        self.XP_final = res.XP
        self.minpaths = res.paths if track_paths else res.XP[None, :]
        self.annealing_run = True
        return res

    # -- result access -------------------------------------------------
    def _tree_at(self, i):
        return self._unravel(jnp.asarray(self.minpaths[i]))

    def weights_at(self, i=-1):
        t = self._tree_at(i)
        return ([np.asarray(w) for w in t["W"]],
                [np.asarray(x) for x in t["b"]])

    def activations_at(self, i=-1):
        t = self._tree_at(i)
        X = [np.asarray(x) for x in t["X"]]
        if self._clamp_input:
            X = [self.U] + X
        return X

    def predict(self, U, i=-1):
        """Forward-propagate fresh inputs through the β-step-i weights."""
        W, b = self.weights_at(i)
        return np.asarray(forward(self.structure, self.g, self.g_out,
                                  W, b, np.asarray(U)))

    def save_weights(self, filename, i=-1):
        W, b = self.weights_at(i)
        flat = np.concatenate([np.ravel(w) for w in W]
                              + [np.ravel(x) for x in b])
        vio._write(filename, flat[None, :])
        return flat

    def save_action_errors(self, filename):
        if not self.annealing_run:
            raise RuntimeError("run anneal() first")
        return vio.save_action_errors(
            filename, self.beta_array, self.A_array, self.me_array,
            self.fe_array)
