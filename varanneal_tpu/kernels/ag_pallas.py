"""Whole-problem fused action+GRADIENT Pallas kernel (all four discs).

Motivation (PARITY.md roofline): at the canonical bench scale the ladder
is SERIALIZATION-bound — an L-BFGS iteration is a chain of small XLA
kernels and per-launch fixed cost dominates. The existing FE kernel
(``fe_pallas.py``) only fuses the model-error *residual* assembly and
only wins at D>=256. At small problems the WHOLE decision state fits
VMEM many times over (canonical config: 161 x 20 f32 = 13 KB), so the
right design is the opposite extreme:

    ONE kernel launch per action+gradient evaluation, computing the
    measurement error, the discretization residuals, the annealed
    model error, AND the full adjoint (via ``jax.vjp`` traced *inside*
    the kernel) over the whole time window at once.

The line-search evaluation — the innermost hot call of the entire
framework (~1.3 per L-BFGS iteration) — then costs one launch instead
of the XLA chain. ``jax.value_and_grad`` of the returned action hits a
``custom_vjp`` whose forward already produced the gradient; the
backward is a free cotangent scale.

Design notes (measured constraints shared with dir_pallas.py):
  - the row shift x_{n+1} is an O(N*D) static sublane-offset slice
    (``_shift_up``; exact, autodiff-transposable). Round 3/4 used an
    (N_pad, N_pad) one-hot shift MATMUL because that jaxlib's Mosaic
    rejected sublane-offset slices; this jaxlib lowers them (probed
    round 5 at (6008, 128)), removing the O(N_pad^2 D) per-eval term
    that killed the fused-solve win past N_pad ~ 300;
  - observations enter pre-EMBEDDED into D-space host-side (Y_emb with
    targets at Lidx columns, W_emb with the RM weights there, zero
    elsewhere) so the ME term is a masked elementwise quadratic — no
    gathers; this also covers scalar and (N_data, L)-diagonal RM with
    one code path;
  - the stimulus rows and their +1 shift are constants — both views are
    prepared host-side;
  - model-grid times are affine in the row index (grid uniformity is a
    predicate condition), rebuilt from an in-kernel iota;
  - members ride the Pallas GRID via ``jax.custom_batching`` (shared
    constants map to block 0; a shared rf is NOT broadcast per member).

Reference semantics: ``varanneal/va_ode.py :: Annealer.A_gaussian``
(action = ME + FE with the 1/(L*N_data) and 1/(D*(N_f-1))
normalizations) [M, SURVEY.md §3.2], pinned here by parity tests
against ``ops.action.make_action`` (itself pinned by the NumPy oracle,
the SciPy golden ladders, and the C++ analytic gradients).

Supported regime (``ag_supported``): all four discretizations
(SimpsonHermite evaluates the model ONCE over every grid row and
recovers the shifted values with exact shift matmuls), f32, static
parameters, any uniform observation stride (baked into the host-side
weight embedding), scalar or (N_data, L)-diagonal RM, scalar or
(N_f-1, D)-diagonal RF (SH: interleaved Simpson/Hermite rows embedded
as two weight planes), uniform grid, padded state <= 2M floats.
Everything else falls back to the XLA action. The measured-win AUTO
regime is narrower: one-step discs at D >= 256 (see
fe_pallas.ag_preferred; SH measured 0.56x at D=100/B=64 and 1.0x at
D=400/B=64 — XLA's batched fusion of the strided slices holds it).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from varanneal_tpu.ops.spec import ProblemSpec
from varanneal_tpu.ops import action as _action
from varanneal_tpu.kernels.fe_pallas import _uniform_grid, _grid_dt

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = bool(flag)


def _pad_to(v, mult):
    return -(-v // mult) * mult


def ag_supported(spec: ProblemSpec, rf, dtype=np.float32) -> bool:
    """Static predicate: the whole-problem fused action+grad kernel
    applies to this problem (all four discretizations; observations may
    sit at any uniform grid stride — they are embedded host-side)."""
    rf_nd = np.ndim(rf)
    RM_nd = np.ndim(spec.RM)
    return (spec.disc in ("euler", "trapezoid", "forwardmap",
                          "SimpsonHermite")
            and not spec.time_dep_p
            and np.dtype(dtype) == np.float32
            and rf_nd in (0, 2)
            and RM_nd in (0, 2)
            and _uniform_grid(spec)
            # whole (N_pad, D_pad) block + vjp residuals must sit well
            # inside VMEM (~16 MB): cap the padded state at 2M floats
            and _pad_to(spec.N_f, 8) * _pad_to(spec.D, 128) <= 2 ** 21)


def _mm(x, y):
    # HIGHEST: the MXU's default f32 path rounds operands to bf16; the
    # shift matmul must reproduce x values exactly
    return jnp.dot(x, y, preferred_element_type=x.dtype,
                   precision=lax.Precision.HIGHEST)


def _shift_up(v):
    """O(N*D) row shift: out[n] = v[n+1], last row zero. Round-5: Mosaic
    on this jaxlib lowers static sublane-offset slices (probed at
    (6008, 128) and (168, 128), values exact, autodiff composes through
    the derived slice/concat transpose), so the (N_pad, N_pad) one-hot
    shift MATMUL the round-3/4 kernels used — O(N_pad^2 D) per eval, the
    measured reason the fused-solve win died at N_pad ~ 300 — is gone."""
    return jnp.concatenate(
        [v[1:], jnp.zeros((1, v.shape[1]), v.dtype)], axis=0)


# ---------------------------------------------------------------------------
# In-kernel compensated (two-float) reduction — round-5, VERDICT r4 #5.
# Mirrors ops.action.comp_sum's semantics (every pairwise add carries
# its exact round-off in a parallel ``lo`` stream) in a Mosaic-friendly
# shape: a zero-fill shift butterfly over SUBLANES (log2(N_pad) stages;
# works for any N_pad) followed by a masked-roll butterfly over LANES.
# Returns the (hi, lo) SCALAR pair UN-normalized — the caller applies
# the 1/(L N) / 1/(D (N-1)) norms and any scalar rf OUTSIDE the kernel
# in f64, exactly as ops.action._quad does (the measured f32 failure is
# the final rounding of the big sums, not the elementwise products —
# which both paths compute in f32).
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """Knuth TwoSum (elementwise): s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def comp_sum_block(x):
    """Compensated sum of every element of a 2-D block: -> (hi, lo)
    scalars with hi + lo the two-float sum. In-kernel safe (static
    slices, positive rolls, no 1-D reshapes)."""
    N, D = x.shape
    hi = x
    lo = jnp.zeros_like(x)
    k = 1
    while k < N:                       # zero-fill shift butterfly
        hs = jnp.concatenate(
            [hi[k:], jnp.zeros((k, D), x.dtype)], axis=0)
        ls = jnp.concatenate(
            [lo[k:], jnp.zeros((k, D), x.dtype)], axis=0)
        hi, e = _two_sum(hi, hs)
        lo = lo + ls + e
        k *= 2
    # row 0 now holds per-lane column sums; butterfly the lanes with
    # zero-filled positive rolls (D need not be a power of two)
    ci = lax.broadcasted_iota(jnp.int32, (N, D), 1)
    zero = jnp.zeros((), x.dtype)
    k = 1
    while k < D:
        # roll(v, D-k)[j] = v[(j+k) mod D]; lanes j >= D-k wrap — mask
        # the OUTPUT there to zero-fill the shift. i32 shift: a python
        # int goes weak-i64 under x64 and tpu.dynamic_rotate rejects
        # i64 operands (measured on hardware, round-5)
        sh_i = jnp.int32(D - k)
        hs = jnp.where(ci < D - k, pltpu.roll(hi, sh_i, 1), zero)
        ls = jnp.where(ci < D - k, pltpu.roll(lo, sh_i, 1), zero)
        hi, e = _two_sum(hi, hs)
        lo = lo + ls + e
        k *= 2
    return hi[0, 0], lo[0, 0]


def build_fwd(spec, has_stim, rf_mode, rf_vals, Y_emb, W_emb, svals,
              N_pad, D_pad, dtype, with_terms=False):
    """Build the in-kernel action forward ``fwd(Xv, p2) -> scalar`` from
    VMEM values (shared between the per-eval kernel below and the
    whole-solve kernel in ``solve_pallas.py``). ``rf_vals``: [scalar] or
    [(N_pad, D_pad) diag] or [rf_s, rf_h] for 'diag_sh'; ``svals``: list
    of (N_pad, S) stimulus shift views (empty when undriven). The time
    ramp and residual mask are constructed here (hoist the call outside
    loops); row shifts are O(N*D) slice shifts (:func:`_shift_up`).

    ``with_terms=True`` (compensated mode): fwd returns
    ``(val, (me_terms, fe_terms_1, fe_terms_2))`` — the elementwise
    quadratic term blocks BEFORE summation, for in-kernel compensated
    reduction (:func:`comp_sum_block`). In 'scalar' rf mode the fe
    terms are UNWEIGHTED (``rmask * r * r``; the caller applies rf and
    the norms outside in f64, as ``ops.action._quad`` does); in diag
    modes the embedded weights multiply elementwise exactly as the XLA
    path does. ``fe_terms_2`` is the Hermite plane under
    SimpsonHermite, zeros otherwise."""
    sh = spec.disc == "SimpsonHermite"
    D, N_f = spec.D, spec.N_f
    h = jnp.asarray(spec.dt, dtype)

    t0 = jnp.asarray(float(np.asarray(spec.t_f)[0]), dtype)
    gdt = jnp.asarray(_grid_dt(spec), dtype)
    # tpu.iota is integer-only (measured): int32 iota then cast
    rows_i = lax.broadcasted_iota(jnp.int32, (N_pad, 1), 0)
    t = (t0 + gdt * rows_i.astype(dtype))[:, 0]
    rows2 = lax.broadcasted_iota(jnp.int32, (N_pad, D_pad), 0)
    if sh:
        # Simpson/Hermite residual rows: EVEN rows n <= N_f - 3
        rmask = ((rows2 < N_f - 2)
                 & (rows2 % jnp.asarray(2, jnp.int32) == 0)).astype(dtype)
    else:
        rmask = (rows2 < N_f - 1).astype(dtype)

    me_norm = jnp.asarray(1.0 / (spec.L * spec.N_data), dtype)
    fe_norm = jnp.asarray(1.0 / (spec.D * (spec.N_f - 1)), dtype)

    def call_f(tt, xx, pp, ss):
        if ss is None:
            return spec.f(tt, xx, pp)
        return spec.f(tt, xx, (pp, ss))

    def _dpad(r):
        if D_pad > D:
            return jnp.concatenate(
                [r, jnp.zeros((N_pad, D_pad - D), dtype)], axis=1)
        return r

    def fwd(Xv, p2):
        p = p2[0, : spec.NP]
        x = Xv[:, :D]
        x1 = _shift_up(Xv)[:, :D]
        if sh:
            # h is the FULL interval over [n, n+2]; grid spacing h/2
            x2 = _shift_up(_shift_up(Xv))[:, :D]
            f0 = call_f(t, x, p, svals[0] if has_stim else None)
            f0p = _dpad(f0)
            f1 = _shift_up(f0p)[:, :D]
            f2 = _shift_up(_shift_up(f0p))[:, :D]
            r_s = x2 - x - (h / 6.0) * (f0 + 4.0 * f1 + f2)
            r_h = x1 - 0.5 * (x + x2) - (h / 8.0) * (f0 - f2)
            r_s, r_h = _dpad(r_s), _dpad(r_h)
            if rf_mode == "diag_sh":
                fe_t1 = rf_vals[0] * rmask * r_s * r_s
                fe_t2 = rf_vals[1] * rmask * r_h * r_h
                fe = jnp.sum(fe_t1) + jnp.sum(fe_t2)
            else:
                fe_t1 = rmask * r_s * r_s
                fe_t2 = rmask * r_h * r_h
                fe = rf_vals[0] * (jnp.sum(fe_t1) + jnp.sum(fe_t2))
            fe = fe_norm * fe
        else:
            f_n = call_f(t, x, p, svals[0] if has_stim else None)
            if spec.disc == "trapezoid":
                f_np1 = call_f(t + h, x1, p,
                               svals[1] if has_stim else None)
                r = x1 - x - (h / 2.0) * (f_n + f_np1)
            elif spec.disc == "euler":
                r = x1 - x - h * f_n
            else:                                  # forwardmap
                r = x1 - f_n
            r = _dpad(r)
            rf_w = rf_vals[0]
            if rf_mode == "scalar":
                fe_t1 = rmask * r * r
                fe = fe_norm * (rf_w * jnp.sum(fe_t1))
            else:
                fe_t1 = rf_w * rmask * r * r
                fe = fe_norm * jnp.sum(fe_t1)
            fe_t2 = jnp.zeros_like(fe_t1)
        dobs = Xv - Y_emb
        me_t = W_emb * dobs * dobs
        me = me_norm * jnp.sum(me_t)
        if with_terms:
            return me + fe, (me_t, fe_t1, fe_t2)
        return me + fe

    return fwd


def _ag_kernel(spec, has_stim, rf_mode, comp, *refs):
    """One member. Inputs:
      X_ref  (1, N_pad, D_pad)  state rows (rows >= N_f zero),
      p_ref  (1, 1, NP_pad)     full merged parameter row,
      rf refs by ``rf_mode``: 'scalar' -> (1, 1, 1) SMEM; 'diag' ->
          (1, N_pad, D_pad); 'diag_sh' -> TWO (1, N_pad, D_pad) refs
          (Simpson weights at even rows, Hermite weights at even rows),
      y_ref  (1, N_pad, D_pad)  embedded observation targets,
      w_ref  (1, N_pad, D_pad)  embedded RM weights (zero = unobserved;
          rows carry the observation stride, so any uniform stride
          works),
      stimulus refs (1, N_pad, S_pad): rows n, n+1 (one-step) and
          additionally n+2 (SimpsonHermite).
    Outputs:
      a_ref  (1, 1, 1) SMEM action value,
      gx_ref (1, N_pad, D_pad)  dA/dX,
      gp_ref (1, 1, NP_pad)     dA/dp (full row; caller slices pidx).

    For SimpsonHermite the model is evaluated ONCE over all grid rows
    (the blocked FE kernel evaluates it three times per interval); the
    shifted values f_{n+1}, f_{n+2} are exact shift matmuls of that one
    evaluation."""
    sh = spec.disc == "SimpsonHermite"
    n_rf = 2 if rf_mode == "diag_sh" else 1
    n_st = (3 if sh else 2) if has_stim else 0
    refs = list(refs)
    X_ref = refs.pop(0)
    p_ref = refs.pop(0)
    rf_refs = [refs.pop(0) for _ in range(n_rf)]
    y_ref = refs.pop(0)
    w_ref = refs.pop(0)
    st_refs = [refs.pop(0) for _ in range(n_st)]
    if comp:
        a_ref, gx_ref, gp_ref, c_ref = refs
    else:
        a_ref, gx_ref, gp_ref = refs

    X = X_ref[0]                                   # (N_pad, D_pad)
    dtype = X.dtype
    N_pad, D_pad = X.shape
    S_w = spec.stim_f.shape[1] if has_stim else 0
    svals = [r[0][:, :S_w] for r in st_refs]
    rf_vals = ([rf_refs[0][0, 0, 0]] if rf_mode == "scalar"
               else [r[0] for r in rf_refs])
    fwd = build_fwd(spec, has_stim, rf_mode, rf_vals, y_ref[0], w_ref[0],
                    svals, N_pad, D_pad, dtype, with_terms=comp)

    if comp:
        # gradient rides the PLAIN forward (the compensated action's
        # gradient equals the plain one to roundoff — compensation
        # protects the SUM, ops/action.py contract); the term blocks
        # come back as vjp aux and feed the two-float reductions
        val, vjp, (me_t, fe1_t, fe2_t) = jax.vjp(fwd, X, p_ref[0],
                                                 has_aux=True)
        gX, gp2 = vjp(jnp.ones((), dtype))
        me_hi, me_lo = comp_sum_block(me_t)
        f1_hi, f1_lo = comp_sum_block(fe1_t)
        f2_hi, f2_lo = comp_sum_block(fe2_t)
        cc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        c_ref[0] = ((cc == 0).astype(dtype) * me_hi
                    + (cc == 1).astype(dtype) * me_lo
                    + (cc == 2).astype(dtype) * f1_hi
                    + (cc == 3).astype(dtype) * f1_lo
                    + (cc == 4).astype(dtype) * f2_hi
                    + (cc == 5).astype(dtype) * f2_lo)
    else:
        val, vjp = jax.vjp(fwd, X, p_ref[0])
        gX, gp2 = vjp(jnp.ones((), dtype))
    a_ref[0, 0, 0] = val
    gx_ref[0] = gX
    gp_ref[0] = gp2


def _ag_batched(spec, has_stim, rf_mode, rf_shared, X, p2, rf_args,
                yv, wv, sts, comp=False):
    """X (B, N_pad, D_pad), p2 (B, 1, NP_pad); ``rf_args``: [rf] with
    rf (B, 1, 1) for 'scalar' | (B|1, N_pad, D_pad) for 'diag'
    (leading 1 = shared across members) | [rf_s, rf_h] both
    (B|1, N_pad, D_pad) for 'diag_sh' (Simpson/Hermite weight
    embeddings); yv/wv/sts shared (1, ...) constants. Small per-member
    arrays are 3-D (B, 1, k) — Mosaic requires the LAST TWO block dims
    tile-divisible or equal to the array dims (measured at B > 1).
    ``comp=True`` adds a (B, 1, 128) output row of compensated
    [me_hi, me_lo, fe1_hi, fe1_lo, fe2_hi, fe2_lo] pairs."""
    B, N_pad, D_pad = X.shape
    NP_pad = p2.shape[-1]
    kern = functools.partial(_ag_kernel, spec, has_stim, rf_mode, comp)
    vmem = pltpu.VMEM

    def per_member(shp):
        return pl.BlockSpec(shp,
                            lambda b: (b,) + (b * 0,) * (len(shp) - 1),
                            memory_space=vmem)

    shared3 = pl.BlockSpec((1, N_pad, D_pad),
                           lambda b: (b * 0, b * 0, b * 0),
                           memory_space=vmem)
    in_specs = [per_member((1, N_pad, D_pad)),
                per_member((1, 1, NP_pad))]
    if rf_mode == "scalar":
        in_specs.append(pl.BlockSpec((1, 1, 1),
                                     lambda b: (b, b * 0, b * 0),
                                     memory_space=pltpu.SMEM))
    else:
        for _ in rf_args:
            in_specs.append(shared3 if rf_shared
                            else per_member((1, N_pad, D_pad)))
    in_specs += [shared3, shared3]
    args = [X, p2] + list(rf_args) + [yv, wv]
    if has_stim:
        S_pad = sts[0].shape[-1]
        sshared = pl.BlockSpec((1, N_pad, S_pad),
                               lambda b: (b * 0, b * 0, b * 0),
                               memory_space=vmem)
        in_specs += [sshared] * len(sts)
        args += list(sts)
    out_specs = [
        pl.BlockSpec((1, 1, 1), lambda b: (b, b * 0, b * 0),
                     memory_space=pltpu.SMEM),
        per_member((1, N_pad, D_pad)),
        per_member((1, 1, NP_pad)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, 1), X.dtype),
        jax.ShapeDtypeStruct((B, N_pad, D_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
    ]
    if comp:
        out_specs.append(per_member((1, 1, 128)))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, 128), X.dtype))
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_INTERPRET[0])(*args)


def embed_consts(spec: ProblemSpec):
    """Host-side shared constants for the whole-problem kernels:
    ``(N_pad, D_pad, NP_pad, yv, wv, sts)`` with yv/wv the embedded
    observation targets/RM weights (1, N_pad, D_pad) and sts the
    stimulus shift views (each (1, N_pad, S_pad))."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    N_pad = _pad_to(N_f, 8)
    D_pad = _pad_to(D, 128)
    NP_pad = _pad_to(max(NP, 1), 128)
    sh = spec.disc == "SimpsonHermite"

    RM = np.asarray(spec.RM, dtype=np.float32)
    Lidx = np.asarray(spec.Lidx, dtype=np.int32)
    Y = np.asarray(spec.Y, dtype=np.float32)
    obs_rows = np.arange(spec.N_data) * spec.obs_stride
    Y_emb = np.zeros((N_pad, D_pad), np.float32)
    W_emb = np.zeros((N_pad, D_pad), np.float32)
    Y_emb[np.ix_(obs_rows, Lidx)] = Y
    W_emb[np.ix_(obs_rows, Lidx)] = RM
    yv = jnp.asarray(Y_emb)[None]
    wv = jnp.asarray(W_emb)[None]

    has_stim = spec.stim_f is not None
    if has_stim:
        stim = np.asarray(spec.stim_f, np.float32)
        S_pad = _pad_to(stim.shape[1], 128)
        sts = []
        for k in range(3 if sh else 2):
            sk = np.zeros((N_pad, S_pad), np.float32)
            sk[: N_f - k, : stim.shape[1]] = stim[k:]
            sts.append(jnp.asarray(sk)[None])
        sts = tuple(sts)
    else:
        sts = ()
    return N_pad, D_pad, NP_pad, yv, wv, sts


def make_prep(spec: ProblemSpec, N_pad, D_pad, NP_pad):
    """Host-side packing ``prep(XP, rf) -> (Xp, p2, rf_args, rf_mode)``
    shared by the whole-problem kernels."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    sh = spec.disc == "SimpsonHermite"
    M_sh = (N_f - 1) // 2
    even_rows = np.arange(M_sh) * 2

    def _prep(XP, rf):
        X = XP[: spec.n_state].reshape(N_f, D)
        pest = XP[spec.n_state:]
        P = _action.merge_params(spec, pest, XP.dtype)
        Xp = jnp.zeros((N_pad, D_pad), XP.dtype).at[:N_f, :D].set(X)
        p2 = jnp.zeros((1, NP_pad), XP.dtype)
        if NP:
            p2 = p2.at[0, :NP].set(P)
        rf = jnp.asarray(rf, XP.dtype)
        if rf.ndim == 2 and sh:
            # interleaved SH convention: even rf rows weight the Simpson
            # residuals, odd rows the Hermite ones (ops/action.py) —
            # both embedded at their interval's EVEN grid row
            z = jnp.zeros((N_pad, D_pad), XP.dtype)
            rf_s = z.at[even_rows, :D].set(rf[even_rows])
            rf_h = z.at[even_rows, :D].set(rf[even_rows + 1])
            return Xp, p2, (rf_s, rf_h), "diag_sh"
        if rf.ndim == 2:
            rfp = jnp.zeros((N_pad, D_pad), XP.dtype).at[
                : N_f - 1, :D].set(rf[: N_f - 1])
            return Xp, p2, (rfp,), "diag"
        return Xp, p2, (rf.reshape(1, 1),), "scalar"

    return _prep


def make_action_ag(spec: ProblemSpec, compensated: bool = False):
    """Build ``(action, action_parts)``: ``action(XP, rf)`` carries a
    custom_vjp whose FORWARD computes value AND gradient in one Pallas
    launch, so ``jax.value_and_grad(action)`` costs a single kernel.
    ``action_parts`` stays on the XLA path (used once per rung for
    records, not in the hot loop).

    ``compensated=True`` (round-5, VERDICT r4 #5): the kernel
    additionally reduces the ME/FE quadratic terms with the in-kernel
    two-float tree (:func:`comp_sum_block`) and the action returns the
    f64-combined scalar, matching ``ops.action.make_action(spec,
    compensated=True)``'s contract (f64 scalar from an f32 decision
    path when x64 is enabled; gradient stays the plain-f32 one — the
    compensated gradient equals it to roundoff). This puts
    accuracy-grade arithmetic on the fused eval path, so high-rf tail
    rungs can run on-chip at f32 speed. Same contract as
    ``ops.action.make_action``; only valid where :func:`ag_supported`.
    Covers all four discretizations and any uniform observation stride
    (the stride is baked into the host-side weight embedding)."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    N_pad, D_pad, NP_pad, yv, wv, sts = embed_consts(spec)
    has_stim = spec.stim_f is not None
    _prep = make_prep(spec, N_pad, D_pad, NP_pad)
    comp = bool(compensated)
    n_out = 4 if comp else 3

    _cache = {}

    def _get_ag_fn(rf_mode):
        """custom_vmap'd (Xp, p2, *rf_args, *consts) -> (a, gX, gp2
        [, crow]); per rf-mode (static). The observation/stimulus
        constants are EXPLICIT ARGUMENTS, not closure consts: a vmapped
        lax.while_loop (the L-BFGS inner loop) instantiates closure
        constants as batched-broadcast, and custom_vmap rejects batched
        jaxpr consts (the measured limitation — same pattern as the
        fe_pallas SH wrapper; consts arriving batched are sliced back
        to their shared row in the rule)."""
        if rf_mode in _cache:
            return _cache[rf_mode]
        n_rf = 2 if rf_mode == "diag_sh" else 1

        @jax.custom_batching.custom_vmap
        def ag_fn(Xp, p2, *rest):
            rf_args = [r[None] for r in rest[:n_rf]]
            cy, cw = rest[n_rf], rest[n_rf + 1]
            outs = _ag_batched(spec, has_stim, rf_mode, False,
                               Xp[None], p2[None], rf_args,
                               cy, cw, rest[n_rf + 2:], comp=comp)
            a, gX, gp2 = outs[0], outs[1], outs[2]
            res = (a[0, 0, 0], gX[0], gp2[0])
            return res + ((outs[3][0],) if comp else ())

        @ag_fn.def_vmap
        def _ag_vmap(axis_size, in_batched, Xp, p2, *rest):
            B = axis_size

            def bc(v, isb):
                return v if isb else jnp.broadcast_to(
                    v[None], (B,) + v.shape)

            rf_in = rest[:n_rf]
            rf_b = in_batched[2: 2 + n_rf]
            # broadcast-batched constants fold back to their shared row
            # (they already carry a leading shared-block axis of 1)
            consts = [c[0] if isb else c
                      for c, isb in zip(rest[n_rf:],
                                        in_batched[2 + n_rf:])]
            cy, cw = consts[0], consts[1]
            Xp = bc(Xp, in_batched[0])
            p2 = bc(p2, in_batched[1])
            rf_shared = rf_mode != "scalar" and not any(rf_b)
            if rf_shared:
                rf_args = [r[None] for r in rf_in]
            else:
                rf_args = [bc(r, isb) for r, isb in zip(rf_in, rf_b)]
            outs = _ag_batched(spec, has_stim, rf_mode, rf_shared,
                               Xp, p2, rf_args, cy, cw, consts[2:],
                               comp=comp)
            res = (outs[0][:, 0, 0], outs[1], outs[2])
            res = res + ((outs[3],) if comp else ())
            return res, tuple(True for _ in range(n_out))

        def call(Xp, p2, rf_args):
            return ag_fn(Xp, p2, *rf_args, yv, wv, *sts)

        _cache[rf_mode] = call
        return call

    def _unpack_grad(gX, gp2):
        gx_flat = gX[:N_f, :D].reshape(-1)
        if spec.NPest:
            pcols = np.asarray(spec.pidx, dtype=np.int32)
            return jnp.concatenate([gx_flat, gp2[0, pcols]])
        return gx_flat

    me_norm_c = 1.0 / (spec.L * spec.N_data)
    fe_norm_c = 1.0 / (spec.D * (spec.N_f - 1))

    def _combine(crow, rf, mode, dtype):
        """f64 (when x64) combine of the in-kernel (hi, lo) pairs —
        mirrors ops.action's compensated contract: the two-float sum
        pairs are joined and scaled (norms; rf in 'scalar' mode) in
        the HIGH dtype, so an f32 decision path gets an ~f64-accurate
        action SCALAR."""
        hi_dt = (jnp.float64 if (dtype == jnp.float32
                                 and jax.config.jax_enable_x64)
                 else dtype)
        c = crow[0].astype(hi_dt)
        me = (c[0] + c[1]) * jnp.asarray(me_norm_c, hi_dt)
        fe = c[2] + c[3] + c[4] + c[5]
        if mode == "scalar":
            fe = jnp.asarray(rf, hi_dt) * fe
        return me + fe * jnp.asarray(fe_norm_c, hi_dt)

    @jax.custom_vjp
    def action(XP, rf):
        Xp, p2, rf_args, mode = _prep(XP, rf)
        outs = _get_ag_fn(mode)(Xp, p2, rf_args)
        if comp:
            return _combine(outs[3], rf, mode, XP.dtype)
        return outs[0]

    def action_fwd(XP, rf):
        Xp, p2, rf_args, mode = _prep(XP, rf)
        outs = _get_ag_fn(mode)(Xp, p2, rf_args)
        a = (_combine(outs[3], rf, mode, XP.dtype) if comp
             else outs[0])
        return a, (_unpack_grad(outs[1], outs[2]), rf)

    def action_bwd(res, ct):
        g, rf = res
        return (ct.astype(g.dtype) * g, jnp.zeros_like(jnp.asarray(rf)))

    action.defvjp(action_fwd, action_bwd)

    # records path (once per rung): plain XLA (compensated XLA when the
    # kernel is compensated, matching the facade's records contract)
    _, xla_parts = _action.make_action(spec, compensated=comp)
    return action, xla_parts


# ---------------------------------------------------------------------------
# transposed layout (components on sublanes, time on lanes) — small D
# ---------------------------------------------------------------------------

def agt_supported(spec: ProblemSpec, rf, dtype=np.float32) -> bool:
    """Predicate for the TRANSPOSED whole-problem kernel: everything
    ``ag_supported`` needs, plus a model that ships a ``.transposed``
    variant (see models/lorenz.py docstring), no stimulus (not yet
    routed in this layout), and small D — at D << 128 the row-major
    layout uses D/128 of the vector lanes while the transposed one uses
    ~D/D_pad of the whole tile."""
    return (ag_supported(spec, rf, dtype)
            and spec.stim_f is None
            and hasattr(spec.f, "transposed")
            and spec.D <= 64)


def _agt_kernel(spec, rf_diag, fT, *refs):
    """One member, TRANSPOSED layout. Inputs:
      X_ref  (1, D_pad, N_pad)  xT block (rows >= D, cols >= N_f zero),
      p_ref  (1, 1, NP_pad), rf_ref (1, 1, 1) SMEM | (1, D_pad, N_pad),
      y_ref/w_ref (1, D_pad, N_pad)  embedded obs targets/RM weights.
    Outputs: a_ref (1, 1, 1) SMEM, gx_ref (1, D_pad, N_pad),
      gp_ref (1, 1, NP_pad)."""
    X_ref, p_ref, rf_ref, y_ref, w_ref, a_ref, gx_ref, gp_ref = refs
    XT = X_ref[0]                                  # (D_pad, N_pad)
    dtype = XT.dtype
    D_pad, N_pad = XT.shape
    D, N_f = spec.D, spec.N_f
    h = jnp.asarray(spec.dt, dtype)

    # lane shift: (XT @ S)[d, n] = XT[d, n+1] (zero last column)
    ri = lax.broadcasted_iota(jnp.int32, (N_pad, N_pad), 0)
    ci = lax.broadcasted_iota(jnp.int32, (N_pad, N_pad), 1)
    S = (ri == ci + 1).astype(dtype)

    t0 = jnp.asarray(float(np.asarray(spec.t_f)[0]), dtype)
    gdt = jnp.asarray(_grid_dt(spec), dtype)
    t = t0 + gdt * lax.broadcasted_iota(
        jnp.int32, (1, N_pad), 1).astype(dtype)    # (1, N_pad) row
    rmask = ((lax.broadcasted_iota(jnp.int32, (D_pad, N_pad), 1)
              < N_f - 1)
             & (lax.broadcasted_iota(jnp.int32, (D_pad, N_pad), 0)
                < D)).astype(dtype)
    Y_emb = y_ref[0]
    W_emb = w_ref[0]
    rf_w = rf_ref[0] if rf_diag else rf_ref[0, 0, 0]

    me_norm = jnp.asarray(1.0 / (spec.L * spec.N_data), dtype)
    fe_norm = jnp.asarray(1.0 / (spec.D * (spec.N_f - 1)), dtype)

    def fwd(XTv, p2):
        p = p2[0, : spec.NP]
        xt1 = _mm(XTv, S)
        f_n = fT(t, XTv, p)
        if spec.disc == "trapezoid":
            f_np1 = fT(t + h, xt1, p)
            r = xt1 - XTv - (h / 2.0) * (f_n + f_np1)
        elif spec.disc == "euler":
            r = xt1 - XTv - h * f_n
        else:                                      # forwardmap
            r = xt1 - f_n
        fe = fe_norm * jnp.sum(rf_w * rmask * r * r)
        dobs = XTv - Y_emb
        me = me_norm * jnp.sum(W_emb * dobs * dobs)
        return me + fe

    val, vjp = jax.vjp(fwd, XT, p_ref[0])
    gX, gp2 = vjp(jnp.ones((), dtype))
    a_ref[0, 0, 0] = val
    gx_ref[0] = gX
    gp_ref[0] = gp2


def _agt_batched(spec, rf_diag, rf_shared, fT, X, p2, rf_in, yv, wv):
    """Transposed batched launch: X (B, D_pad, N_pad); rest as
    _ag_batched (3-D small blocks, shared constants on block 0)."""
    B, D_pad, N_pad = X.shape
    NP_pad = p2.shape[-1]
    kern = functools.partial(_agt_kernel, spec, rf_diag, fT)
    vmem = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, D_pad, N_pad), lambda b: (b, b * 0, b * 0),
                     memory_space=vmem),
        pl.BlockSpec((1, 1, NP_pad), lambda b: (b, b * 0, b * 0),
                     memory_space=vmem),
    ]
    if rf_diag:
        if rf_shared:
            in_specs.append(pl.BlockSpec(
                (1, D_pad, N_pad), lambda b: (b * 0, b * 0, b * 0),
                memory_space=vmem))
        else:
            in_specs.append(pl.BlockSpec(
                (1, D_pad, N_pad), lambda b: (b, b * 0, b * 0),
                memory_space=vmem))
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1),
                                     lambda b: (b, b * 0, b * 0),
                                     memory_space=pltpu.SMEM))
    shared = pl.BlockSpec((1, D_pad, N_pad),
                          lambda b: (b * 0, b * 0, b * 0),
                          memory_space=vmem)
    in_specs += [shared, shared]
    out_specs = [
        pl.BlockSpec((1, 1, 1), lambda b: (b, b * 0, b * 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D_pad, N_pad), lambda b: (b, b * 0, b * 0),
                     memory_space=vmem),
        pl.BlockSpec((1, 1, NP_pad), lambda b: (b, b * 0, b * 0),
                     memory_space=vmem),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, 1), X.dtype),
        jax.ShapeDtypeStruct((B, D_pad, N_pad), X.dtype),
        jax.ShapeDtypeStruct((B, 1, NP_pad), X.dtype),
    ]
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_INTERPRET[0])(
        X, p2, rf_in, yv, wv)


def make_action_ag_t(spec: ProblemSpec):
    """Transposed-layout variant of :func:`make_action_ag` (same
    ``(action, action_parts)`` contract). Only valid where
    :func:`agt_supported`."""
    N_f, D, NP = spec.N_f, spec.D, spec.NP
    D_pad = _pad_to(max(D, 8), 8)
    N_pad = _pad_to(N_f, 128)
    NP_pad = _pad_to(max(NP, 1), 128)
    fT = spec.f.transposed(D)

    RM = np.asarray(spec.RM, dtype=np.float32)
    Lidx = np.asarray(spec.Lidx, dtype=np.int32)
    Y = np.asarray(spec.Y, dtype=np.float32)
    Y_emb = np.zeros((D_pad, N_pad), np.float32)
    W_emb = np.zeros((D_pad, N_pad), np.float32)
    Y_emb[Lidx, : spec.N_data] = Y.T
    W_emb[Lidx, : spec.N_data] = RM.T if RM.ndim else RM
    yv = jnp.asarray(Y_emb)[None]
    wv = jnp.asarray(W_emb)[None]

    def _prep(XP, rf):
        X = XP[: spec.n_state].reshape(N_f, D)
        pest = XP[spec.n_state:]
        P = _action.merge_params(spec, pest, XP.dtype)
        Xp = jnp.zeros((D_pad, N_pad), XP.dtype).at[:D, :N_f].set(X.T)
        p2 = jnp.zeros((1, NP_pad), XP.dtype)
        if NP:
            p2 = p2.at[0, :NP].set(P)
        rf = jnp.asarray(rf, XP.dtype)
        if rf.ndim == 2:
            rfp = jnp.zeros((D_pad, N_pad), XP.dtype).at[
                :D, : N_f - 1].set(rf[: N_f - 1].T)
            return Xp, p2, rfp, True
        return Xp, p2, rf.reshape(1, 1), False

    _cache = {}

    def _get_fn(rf_is_diag):
        if rf_is_diag in _cache:
            return _cache[rf_is_diag]

        @jax.custom_batching.custom_vmap
        def agt_fn(Xp, p2, rf_in, cy, cw):
            a, gX, gp2 = _agt_batched(spec, rf_is_diag, False, fT,
                                      Xp[None], p2[None], rf_in[None],
                                      cy, cw)
            return a[0, 0, 0], gX[0], gp2[0]

        @agt_fn.def_vmap
        def _agt_vmap(axis_size, in_batched, Xp, p2, rf_in, cy, cw):
            B = axis_size

            def bc(v, isb):
                return v if isb else jnp.broadcast_to(
                    v[None], (B,) + v.shape)

            cy = cy[0] if in_batched[3] else cy
            cw = cw[0] if in_batched[4] else cw
            Xp = bc(Xp, in_batched[0])
            p2 = bc(p2, in_batched[1])
            rf_shared = rf_is_diag and not in_batched[2]
            if rf_shared:
                rf_in = rf_in[None]
            else:
                rf_in = bc(rf_in, in_batched[2])
            a, gX, gp2 = _agt_batched(spec, rf_is_diag, rf_shared, fT,
                                      Xp, p2, rf_in, cy, cw)
            return (a[:, 0, 0], gX, gp2), (True, True, True)

        def call(Xp, p2, rf_in):
            return agt_fn(Xp, p2, rf_in, yv, wv)

        _cache[rf_is_diag] = call
        return call

    def _unpack_grad(gX, gp2):
        gx_flat = gX[:D, :N_f].T.reshape(-1)
        if spec.NPest:
            pcols = np.asarray(spec.pidx, dtype=np.int32)
            return jnp.concatenate([gx_flat, gp2[0, pcols]])
        return gx_flat

    @jax.custom_vjp
    def action(XP, rf):
        Xp, p2, rf_in, is_diag = _prep(XP, rf)
        a, _, _ = _get_fn(is_diag)(Xp, p2, rf_in)
        return a

    def action_fwd(XP, rf):
        Xp, p2, rf_in, is_diag = _prep(XP, rf)
        a, gX, gp2 = _get_fn(is_diag)(Xp, p2, rf_in)
        return a, (_unpack_grad(gX, gp2), rf)

    def action_bwd(res, ct):
        g, rf = res
        return (ct * g, jnp.zeros_like(jnp.asarray(rf)))

    action.defvjp(action_fwd, action_bwd)
    _, xla_parts = _action.make_action(spec)
    return action, xla_parts
