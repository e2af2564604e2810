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
// Scope: Lorenz-96 vector field, trapezoid discretization, scalar RM/RF,
// uniform observation stride, optional estimation of the forcing F as the
// single parameter appended to the flat decision vector.
//
// Exported C ABI (see varanneal_tpu/native.py):
//   l96_trap_action_grad(xp, N, D, y, n_data, lidx, L, stride,
//                        rm, rf, dt, est_F, F_fixed, out_grad) -> A
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

// Version tag so the ctypes wrapper can detect stale builds.
int valib_abi_version() { return 1; }

}  // extern "C"
