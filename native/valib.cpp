// valib — native C++ analytic action/gradient engine for varanneal_tpu.
//
// Role (SURVEY.md §2 "Native components"): the reference's numerical core is
// native (ADOL-C C++ taping AD + Fortran L-BFGS-B). The TPU rebuild's compute
// path is XLA; this library is the native-side counterpart used as
//   (a) a THIRD independent oracle for the action and its gradient — the
//       gradient here is hand-derived analytically, sharing no code with
//       either jax.grad or the NumPy test oracle; and
//   (b) a fast host-side CPU fallback for action evaluation.
//
// Scope: Lorenz-96 vector field, trapezoid AND Hermite–Simpson
// discretizations, scalar RM/RF, uniform observation stride, optional
// estimation of the forcing F as the single parameter appended to the flat
// decision vector. Hermite–Simpson is SURVEY.md §7 hard-part #4 (the
// doubled grid / midpoint packing) — exactly where a third independent
// hand-derived gradient pays.
//
// Exported C ABI (see varanneal_tpu/native.py):
//   l96_trap_action_grad(xp, N, D, y, n_data, lidx, L, stride,
//                        rm, rf, dt, est_F, F_fixed, out_grad) -> A
//   l96_sh_action_grad(xp, N_f, D, y, n_data, lidx, L, stride,
//                      rm, rf, dt, est_F, F_fixed, out_grad) -> A
// All arrays are double, row-major.

#include <cstddef>
#include <cstring>
#include <vector>

namespace {

inline int wrap(int i, int D) { return ((i % D) + D) % D; }

// f_d(x) = (x_{d+1} - x_{d-2}) * x_{d-1} - x_d + F
void l96_f(const double* x, int D, double F, double* out) {
    for (int d = 0; d < D; ++d) {
        out[d] = (x[wrap(d + 1, D)] - x[wrap(d - 2, D)]) * x[wrap(d - 1, D)]
                 - x[d] + F;
    }
}

// (J(x)^T v)_e = x_{e-2} v_{e-1} + (x_{e+2} - x_{e-1}) v_{e+1}
//               - x_{e+1} v_{e+2} - v_e
void l96_jtv(const double* x, const double* v, int D, double* out) {
    for (int e = 0; e < D; ++e) {
        out[e] = x[wrap(e - 2, D)] * v[wrap(e - 1, D)]
               + (x[wrap(e + 2, D)] - x[wrap(e - 1, D)]) * v[wrap(e + 1, D)]
               - x[wrap(e + 1, D)] * v[wrap(e + 2, D)]
               - v[e];
    }
}

}  // namespace

extern "C" {

// Returns the action A; writes dA/dxp into out_grad (length N*D + est_F).
// xp: flat decision vector [X row-major (N, D); optionally F].
// y: observations (n_data, L); lidx: observed columns; stride: model rows
// between data rows. rm, rf: scalar precisions. est_F: 0/1.
double l96_trap_action_grad(
    const double* xp, int N, int D,
    const double* y, int n_data, const int* lidx, int L, int stride,
    double rm, double rf, double dt, int est_F, double F_fixed,
    double* out_grad) {

    const double F = est_F ? xp[(std::size_t)N * D] : F_fixed;
    const std::size_t n_state = (std::size_t)N * D;
    std::memset(out_grad, 0, (n_state + (est_F ? 1 : 0)) * sizeof(double));

    // ---- measurement error ------------------------------------------
    const double me_c = rm / ((double)L * (double)n_data);
    double me = 0.0;
    for (int n = 0; n < n_data; ++n) {
        const double* xrow = xp + (std::size_t)(n * stride) * D;
        const double* yrow = y + (std::size_t)n * L;
        double* grow = out_grad + (std::size_t)(n * stride) * D;
        for (int l = 0; l < L; ++l) {
            const double diff = xrow[lidx[l]] - yrow[l];
            me += me_c * diff * diff;
            grow[lidx[l]] += 2.0 * me_c * diff;
        }
    }

    // ---- model error (trapezoid) -------------------------------------
    const double fe_c = rf / ((double)D * (double)(N - 1));
    std::vector<double> fn(D), fnp1(D), r(D), jtv(D), racc(D);
    std::vector<double> r_prev(D, 0.0);
    double fe = 0.0;
    double sum_r_all = 0.0;  // for dA/dF

    // f at row 0
    l96_f(xp, D, F, fn.data());
    for (int n = 0; n < N - 1; ++n) {
        const double* x_n = xp + (std::size_t)n * D;
        const double* x_np1 = xp + (std::size_t)(n + 1) * D;
        l96_f(x_np1, D, F, fnp1.data());
        for (int d = 0; d < D; ++d) {
            r[d] = x_np1[d] - x_n[d] - 0.5 * dt * (fn[d] + fnp1[d]);
            fe += fe_c * r[d] * r[d];
            sum_r_all += r[d];
        }
        // grad wrt x_n gets: 2c * (-r_n - (dt/2) J(x_n)^T r_n)
        //               plus: 2c * (+r_{n-1} - (dt/2) J(x_n)^T r_{n-1})
        // accumulate both residual rows that touch x_n:
        double* g_n = out_grad + (std::size_t)n * D;
        for (int d = 0; d < D; ++d) racc[d] = r[d] + r_prev[d];
        l96_jtv(x_n, racc.data(), D, jtv.data());
        for (int d = 0; d < D; ++d) {
            g_n[d] += 2.0 * fe_c
                      * (r_prev[d] - r[d] - 0.5 * dt * jtv[d]);
        }
        r_prev = r;
        fn = fnp1;
    }
    // last row: only residual N-2 touches x_{N-1}
    {
        double* g_last = out_grad + (std::size_t)(N - 1) * D;
        const double* x_last = xp + (std::size_t)(N - 1) * D;
        l96_jtv(x_last, r_prev.data(), D, jtv.data());
        for (int d = 0; d < D; ++d) {
            g_last[d] += 2.0 * fe_c * (r_prev[d] - 0.5 * dt * jtv[d]);
        }
    }
    if (est_F) {
        // dr_{n,d}/dF = -dt  (both f_n and f_{n+1} shift by 1)
        out_grad[n_state] = -2.0 * fe_c * dt * sum_r_all;
    }
    return me + fe;
}

// Hermite–Simpson action + analytic gradient on the doubled grid
// (ops/spec.py grid conventions: N_f = 2*N_base - 1 rows at spacing dt/2;
// interval m spans rows [2m, 2m+2] with full step h = dt; observations
// couple to rows n * 2*stride).
//
// Residuals per interval (ops/disc.py [pinned-by-oracle]):
//   S_m = x_{e1} - x_{e0} - (h/6)(f0 + 4 f_mid + f1)
//   H_m = x_mid - (x_{e0}+x_{e1})/2 - (h/8)(f0 - f1)
// Adjoint (hand-derived; independent of jax.grad and the NumPy oracle):
//   g_e0 += 2c [ -S - H/2 + J0^T v0 ],  v0 = -(h/6) S - (h/8) H
//   g_mid += 2c [  H      + Jm^T vm ],  vm = -(4h/6) S
//   g_e1 += 2c [  S - H/2 + J1^T v1 ],  v1 = -(h/6) S + (h/8) H
//   dA/dF = 2c * sum_m sum_d (v0 + vm + v1)_d   (df_d/dF = 1)
double l96_sh_action_grad(
    const double* xp, int N_f, int D,
    const double* y, int n_data, const int* lidx, int L, int stride,
    double rm, double rf, double dt, int est_F, double F_fixed,
    double* out_grad) {

    const double F = est_F ? xp[(std::size_t)N_f * D] : F_fixed;
    const std::size_t n_state = (std::size_t)N_f * D;
    std::memset(out_grad, 0, (n_state + (est_F ? 1 : 0)) * sizeof(double));

    // ---- measurement error (even grid rows only) ---------------------
    const double me_c = rm / ((double)L * (double)n_data);
    const int obs_stride = 2 * stride;
    double me = 0.0;
    for (int n = 0; n < n_data; ++n) {
        const double* xrow = xp + (std::size_t)(n * obs_stride) * D;
        const double* yrow = y + (std::size_t)n * L;
        double* grow = out_grad + (std::size_t)(n * obs_stride) * D;
        for (int l = 0; l < L; ++l) {
            const double diff = xrow[lidx[l]] - yrow[l];
            me += me_c * diff * diff;
            grow[lidx[l]] += 2.0 * me_c * diff;
        }
    }

    // ---- model error (Hermite–Simpson) -------------------------------
    const double fe_c = rf / ((double)D * (double)(N_f - 1));
    const double h = dt;
    const int M = (N_f - 1) / 2;
    std::vector<double> f0(D), fm(D), f1(D), S(D), H(D);
    std::vector<double> v0(D), vm(D), v1(D), jtv(D);
    double fe = 0.0;
    double vsum = 0.0;                       // sum of all adjoint seeds

    for (int m = 0; m < M; ++m) {
        const double* xe0 = xp + (std::size_t)(2 * m) * D;
        const double* xm = xp + (std::size_t)(2 * m + 1) * D;
        const double* xe1 = xp + (std::size_t)(2 * m + 2) * D;
        l96_f(xe0, D, F, f0.data());
        l96_f(xm, D, F, fm.data());
        l96_f(xe1, D, F, f1.data());
        for (int d = 0; d < D; ++d) {
            S[d] = xe1[d] - xe0[d]
                   - (h / 6.0) * (f0[d] + 4.0 * fm[d] + f1[d]);
            H[d] = xm[d] - 0.5 * (xe0[d] + xe1[d])
                   - (h / 8.0) * (f0[d] - f1[d]);
            fe += fe_c * (S[d] * S[d] + H[d] * H[d]);
            v0[d] = -(h / 6.0) * S[d] - (h / 8.0) * H[d];
            vm[d] = -(4.0 * h / 6.0) * S[d];
            v1[d] = -(h / 6.0) * S[d] + (h / 8.0) * H[d];
            vsum += v0[d] + vm[d] + v1[d];
        }
        double* g_e0 = out_grad + (std::size_t)(2 * m) * D;
        double* g_m = out_grad + (std::size_t)(2 * m + 1) * D;
        double* g_e1 = out_grad + (std::size_t)(2 * m + 2) * D;
        l96_jtv(xe0, v0.data(), D, jtv.data());
        for (int d = 0; d < D; ++d)
            g_e0[d] += 2.0 * fe_c * (-S[d] - 0.5 * H[d] + jtv[d]);
        l96_jtv(xm, vm.data(), D, jtv.data());
        for (int d = 0; d < D; ++d)
            g_m[d] += 2.0 * fe_c * (H[d] + jtv[d]);
        l96_jtv(xe1, v1.data(), D, jtv.data());
        for (int d = 0; d < D; ++d)
            g_e1[d] += 2.0 * fe_c * (S[d] - 0.5 * H[d] + jtv[d]);
    }
    if (est_F) {
        out_grad[n_state] = 2.0 * fe_c * vsum;
    }
    return me + fe;
}

// Version tag so the ctypes wrapper can detect stale builds.
int valib_abi_version() { return 2; }

}  // extern "C"
