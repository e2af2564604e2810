"""Independent NumPy oracle for the VA action.

This is the ground truth demanded by SURVEY.md §4: the reference mount is
empty, so every numeric convention (normalizations, packing order,
discretization coefficients) is pinned HERE, in straight-line NumPy written
independently of the JAX code paths (explicit loops, no shared helpers).
The JAX implementation must match this oracle to float64 round-off.

Also provides a SciPy L-BFGS-B ladder driver used to produce golden
action-vs-β tables (the integration-test contract, BASELINE.md ≤1e-8 rel).
"""

import numpy as np


# ----------------------------------------------------------------------
# Independent NumPy model implementations (no jnp).
# ----------------------------------------------------------------------

def lorenz96_np(t, x, p):
    D = x.shape[-1]
    dx = np.empty_like(x)
    for i in range(D):
        F = p[..., 0] if np.ndim(p) == 2 else (p[0] if np.ndim(p) == 1 else p)
        dx[..., i] = ((x[..., (i + 1) % D] - x[..., (i - 2) % D])
                      * x[..., (i - 1) % D] - x[..., i] + F)
    return dx


def nakl_np(t, x, p):
    if isinstance(p, tuple):
        p, stim = p
        Iinj = np.asarray(stim)[..., 0]
    else:
        Iinj = 0.0

    def col(j):
        return p[..., j] if np.ndim(p) == 2 else p[j]

    (Cm, gNa, ENa, gK, EK, gL, EL) = [col(j) for j in range(7)]
    (vm, dvm, tm0, tm1) = [col(j) for j in range(7, 11)]
    (vh, dvh, th0, th1) = [col(j) for j in range(11, 15)]
    (vn, dvn, tn0, tn1) = [col(j) for j in range(15, 19)]
    V, m, h, n = x[..., 0], x[..., 1], x[..., 2], x[..., 3]

    def gate(a, va, dva, ta0, ta1):
        th_ = np.tanh((V - va) / dva)
        return (0.5 * (1 + th_) - a) / (ta0 + ta1 * (1 - th_ ** 2))

    dV = (gNa * m ** 3 * h * (ENa - V) + gK * n ** 4 * (EK - V)
          + gL * (EL - V) + Iinj) / Cm
    return np.stack(
        [dV, gate(m, vm, dvm, tm0, tm1), gate(h, vh, dvh, th0, th1),
         gate(n, vn, dvn, tn0, tn1)], axis=-1)


# ----------------------------------------------------------------------
# Oracle action.
# ----------------------------------------------------------------------

class OracleProblem:
    """Straight-line NumPy implementation of the VA action.

    Mirrors the reference semantics reconstructed in SURVEY.md §2/§3.2;
    deliberately written with explicit per-timestep loops for the matrix-R
    contractions so it shares no structure with the JAX implementation.
    """

    def __init__(self, f, D, Y, t_data, Lidx, RM, *, disc="trapezoid",
                 P=None, pidx=None, stim=None, dt_model=None):
        self.f = f
        self.D = D
        self.Y = np.asarray(Y, float)
        self.N_data = self.Y.shape[0]
        self.Lidx = list(Lidx)
        self.L = len(self.Lidx)
        self.disc = disc
        t_data = np.asarray(t_data, float)
        dt_data = t_data[1] - t_data[0]
        if dt_model is None:
            self.nskip = 1
            self.dt = dt_data
        else:
            self.nskip = int(round(dt_data / dt_model))
            self.dt = dt_data / self.nskip
        N_base = (self.N_data - 1) * self.nskip + 1
        if disc == "SimpsonHermite":
            self.N_f = 2 * N_base - 1
            grid_dt = self.dt / 2.0
            self.obs_stride = 2 * self.nskip
        else:
            self.N_f = N_base
            grid_dt = self.dt
            self.obs_stride = self.nskip
        self.t_f = t_data[0] + grid_dt * np.arange(self.N_f)

        P = np.zeros((0,)) if P is None else np.asarray(P, float)
        if P.ndim == 2:
            if P.shape[0] == self.N_data and self.nskip > 1:
                P = _interp_rows(P, N_base)
            if P.shape[0] == N_base and disc == "SimpsonHermite":
                P = _midpoints(P)
            assert P.shape[0] == self.N_f
        self.P = P
        self.NP = P.shape[-1] if P.ndim else 0
        self.pidx = list(range(self.NP)) if pidx is None else list(pidx)
        self.NPest = len(self.pidx)
        self.time_dep = P.ndim == 2

        if stim is not None:
            stim = np.asarray(stim, float)
            if stim.ndim == 1:
                stim = stim[:, None]
            if stim.shape[0] == self.N_data and self.nskip > 1:
                stim = _interp_rows(stim, N_base)
            if stim.shape[0] == N_base and disc == "SimpsonHermite":
                stim = _midpoints(stim)
            assert stim.shape[0] == self.N_f
        self.stim = stim
        self.RM = np.asarray(RM, float)
        self.n_state = self.N_f * self.D
        self.n_dof = self.n_state + self.NPest * (
            self.N_f if self.time_dep else 1)

    # -- packing ---------------------------------------------------------
    def unpack(self, XP):
        XP = np.asarray(XP, float)
        X = XP[: self.n_state].reshape(self.N_f, self.D)
        P = np.array(self.P, float, copy=True)
        if self.NPest:
            pest = XP[self.n_state:]
            if self.time_dep:
                P[:, self.pidx] = pest.reshape(self.N_f, self.NPest)
            else:
                P[self.pidx] = pest
        return X, P

    def pack(self, X, P=None):
        P = self.P if P is None else np.asarray(P, float)
        parts = [np.asarray(X, float).ravel()]
        if self.NPest:
            if self.time_dep:
                parts.append(P[:, self.pidx].ravel())
            else:
                parts.append(P[self.pidx])
        return np.concatenate(parts)

    # -- model call ------------------------------------------------------
    def _fcall(self, sl, X, P):
        t = self.t_f[sl]
        x = X[sl]
        p = P[sl] if self.time_dep else P
        if self.stim is not None:
            return self.f(t, x, (p, self.stim[sl]))
        return self.f(t, x, p)

    # -- action ----------------------------------------------------------
    def me(self, X):
        diff = X[::self.obs_stride][:, self.Lidx] - self.Y
        if self.RM.ndim == 0:
            merr = float(self.RM) * np.sum(diff * diff)
        elif self.RM.ndim == 2:
            merr = np.sum(self.RM * diff * diff)
        else:
            merr = 0.0
            for i in range(self.N_data):
                merr += diff[i] @ self.RM[i] @ diff[i]
        return merr / (self.L * self.N_data)

    def fe(self, X, P, RF):
        RF = np.asarray(RF, float)
        h = self.dt
        if self.disc == "SimpsonHermite":
            fn = self._fcall(slice(None, -2, 2), X, P)
            fm = self._fcall(slice(1, -1, 2), X, P)
            fo = self._fcall(slice(2, None, 2), X, P)
            xe, xm, xo = X[:-2:2], X[1:-1:2], X[2::2]
            d1 = xo - xe - (h / 6.0) * (fn + 4.0 * fm + fo)
            d2 = xm - 0.5 * (xe + xo) - (h / 8.0) * (fn - fo)
            if RF.ndim == 0:
                ferr = float(RF) * (np.sum(d1 * d1) + np.sum(d2 * d2))
            elif RF.ndim == 2:
                ferr = np.sum(RF[::2] * d1 * d1) + np.sum(RF[1::2] * d2 * d2)
            else:
                ferr = 0.0
                for i in range(d1.shape[0]):
                    ferr += d1[i] @ RF[2 * i] @ d1[i]
                    ferr += d2[i] @ RF[2 * i + 1] @ d2[i]
        else:
            if self.disc == "trapezoid":
                fn = self._fcall(slice(None, -1), X, P)
                fo = self._fcall(slice(1, None), X, P)
                d = X[1:] - X[:-1] - (h / 2.0) * (fn + fo)
            elif self.disc == "euler":
                fn = self._fcall(slice(None, -1), X, P)
                d = X[1:] - X[:-1] - h * fn
            elif self.disc == "forwardmap":
                fn = self._fcall(slice(None, -1), X, P)
                d = X[1:] - fn
            else:
                raise ValueError(self.disc)
            if RF.ndim == 0:
                ferr = float(RF) * np.sum(d * d)
            elif RF.ndim == 2:
                ferr = np.sum(RF * d * d)
            else:
                ferr = 0.0
                for i in range(d.shape[0]):
                    ferr += d[i] @ RF[i] @ d[i]
        return ferr / (self.D * (self.N_f - 1))

    def action(self, XP, RF):
        X, P = self.unpack(XP)
        me = self.me(X)
        fe = self.fe(X, P, RF)
        return me + fe, me, fe

    def grad_fd(self, XP, RF, directions, eps=1e-6):
        """Central-difference directional derivatives along unit directions
        (rows of ``directions``) — the gradient oracle."""
        out = []
        for v in directions:
            ap = self.action(XP + eps * v, RF)[0]
            am = self.action(XP - eps * v, RF)[0]
            out.append((ap - am) / (2 * eps))
        return np.asarray(out)


def _midpoints(A):
    out = np.zeros((2 * A.shape[0] - 1,) + A.shape[1:], float)
    out[::2] = A
    out[1::2] = 0.5 * (A[:-1] + A[1:])
    return out


def _interp_rows(A, N_out):
    xi = np.linspace(0.0, A.shape[0] - 1.0, N_out)
    out = np.empty((N_out,) + A.shape[1:], float)
    for k in range(A.shape[1]):
        out[:, k] = np.interp(xi, np.arange(A.shape[0]), A[:, k])
    return out


# ----------------------------------------------------------------------
# SciPy ladder driver (golden-table generator).
# ----------------------------------------------------------------------

def scipy_ladder(value_and_grad, XP0, betas, rf0, alpha, *, bounds=None,
                 maxiter=1000, pgtol=1e-8, factr=10.0, parts_fn=None):
    """Run the annealing ladder with SciPy L-BFGS-B, warm-started across β —
    the reference protocol (``varanneal/va_ode.py :: Annealer.anneal_step``).

    ``value_and_grad(XP, rf) -> (A, grad)`` must be float64-exact (we pass in
    the parity-verified function); ``parts_fn(XP, rf) -> (A, ME, FE)`` is
    optional. Returns dict of per-β arrays.
    """
    from scipy.optimize import minimize

    XP = np.asarray(XP0, float)
    rf0 = np.asarray(rf0, float)
    A_arr, me_arr, fe_arr, flags, paths, nits = [], [], [], [], [], []
    for beta in betas:
        rf = rf0 * float(alpha) ** float(beta)
        res = minimize(
            lambda z: value_and_grad(z, rf), XP, jac=True, method="L-BFGS-B",
            bounds=bounds,
            options=dict(maxiter=maxiter, maxfun=10 * maxiter,
                         gtol=pgtol, ftol=factr * np.finfo(float).eps))
        XP = res.x
        A_arr.append(res.fun)
        if parts_fn is not None:
            _, me, fe = parts_fn(XP, rf)
            me_arr.append(float(me))
            fe_arr.append(float(fe))
        flags.append(res.status)
        nits.append(res.nit)
        paths.append(XP.copy())
    out = dict(A=np.asarray(A_arr), exitflags=np.asarray(flags),
               niter=np.asarray(nits), paths=np.asarray(paths))
    if parts_fn is not None:
        out["ME"] = np.asarray(me_arr)
        out["FE"] = np.asarray(fe_arr)
    return out
