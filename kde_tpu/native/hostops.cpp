// Native host fast-path ops for kde_tpu (built into libhostops.so; loaded
// via ctypes by kde_tpu/native/__init__.py, with the pure-NumPy twins in
// ops/host_small.py as the always-available fallback and parity oracle).
//
// Scope: the reference's small-N README flows (N <= ~300) are pure host
// latency (BASELINE.md), so their hot loops live here:
//   * kde_loo_golden / kde_loo_golden_1d -- the LOOCV golden-search probe
//     loop of `ksize` (reference src/CrossValidation.jl:15-24,44-120):
//     nll(alpha) = -sum_i w_i log( sum_j w_j exp(a * D_ij) ) + tail over
//     the shifted LOO distance matrix D (row-min 0 at the nearest live
//     neighbour, +inf on the diagonal), a = -0.5 / (base_var alpha^2).
//   * kde_log_eval_1d -- the dense mixture evaluation of evalDirect
//     (reference src/DualTree01.jl:130-162) for 1-D hosts.
//
// The inner kernel is a hand-vectorized AVX-512 exp for arguments <= 0
// (16-entry 2^(j/16) lookup via vpermi2pd + degree-6 polynomial): GCC 12
// reports the scalar loop as vectorized but emits scalar code on
// sapphirerapids, and the no-overflow domain lets the scaling path stay
// branch-free.  A portable scalar fallback compiles everywhere else.
//
// Numerical contract: golden-section bracket arithmetic is bitwise
// identical to ops/host_small.py::_golden_scalar (same IEEE double ops in
// the same order).  Probe VALUES differ from the NumPy twin only in
// exp/log ULPs and summation order (~1e-14 relative), far below the
// search's decision margins; selection parity vs the NumPy and f64 device
// searches is asserted in tests/test_host_small.py.
//
// This file is compiled separately from balltree.cpp (its own .so, its own
// flags): balltree.cpp carries a bit-identity invariant with
// ops/balltree.py and must not pick up -march=native / contraction flags.

#include <cmath>
#include <cstdint>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512DQ__)
#include <immintrin.h>
#define KDE_HOSTOPS_AVX512 1
#endif

namespace {

constexpr double kLog2E16 = 16.0 * 1.4426950408889634073599246810019;
// Cody-Waite split of ln2/16: hi has a 32-bit mantissa so m*hi is exact
// for |m| <= 2^20 (|m| <= 17221 here), lo carries the remainder
constexpr double kLn2_16Hi = 0x1.62e4200000000p-5;
constexpr double kLn2_16Lo = 0x1.fdf473de6af28p-26;
constexpr double kClamp = -746.0;          // exp(-746) == 0.0 in f64

// 2^(j/16), j = 0..15 (correctly rounded doubles, exact hex)
alignas(64) const double kTab[16] = {
    0x1.0000000000000p+0, 0x1.0b5586cf9890fp+0,
    0x1.172b83c7d517bp+0, 0x1.2387a6e756238p+0,
    0x1.306fe0a31b715p+0, 0x1.3dea64c123422p+0,
    0x1.4bfdad5362a27p+0, 0x1.5ab07dd485429p+0,
    0x1.6a09e667f3bcdp+0, 0x1.7a11473eb0187p+0,
    0x1.8ace5422aa0dbp+0, 0x1.9c49182a3f090p+0,
    0x1.ae89f995ad3adp+0, 0x1.c199bdd85529cp+0,
    0x1.d5818dcfba487p+0, 0x1.ea4afa2a490dap+0,
};

// exp(x) for x <= 0 (including -inf), ~1-2 ulp:
//   x = (k + j/16) ln2 + r,  |r| <= ln2/32
//   exp(x) = 2^k * tab[j] * poly6(r)
// Scalar reference / fallback implementation.
inline double exp_neg_scalar(double x) {
    x = std::fmax(x, kClamp);
    double m = std::nearbyint(x * kLog2E16);           // k*16 + j
    double r = (x - m * kLn2_16Hi) - m * kLn2_16Lo;
    double p = 1.0 / 720.0;
    p = p * r + 1.0 / 120.0;
    p = p * r + 1.0 / 24.0;
    p = p * r + 1.0 / 6.0;
    p = p * r + 0.5;
    p = p * r + 1.0;
    p = p * r + 1.0;
    std::int64_t mi = static_cast<std::int64_t>(m);
    std::int64_t k = mi >> 4;                          // floor(m/16)
    std::int64_t j = mi & 15;
    // single-factor 2^k with the exponent clamped at the normal floor:
    // only reachable for x < -708 where the result is < 1e-307 and
    // contributes nothing against the row's exp(0) live-neighbour term
    if (k < -1022) k = -1022;
    std::uint64_t bits = static_cast<std::uint64_t>(k + 1023) << 52;
    double sc;
    __builtin_memcpy(&sc, &bits, sizeof(sc));
    return p * kTab[j] * sc;
}

#ifdef KDE_HOSTOPS_AVX512

inline __m512d exp_neg_v(__m512d x) {
    x = _mm512_max_pd(x, _mm512_set1_pd(kClamp));
    // m = nearbyint(x * 16/ln2); imm 0x08 = nearest-even | suppress
    __m512d m = _mm512_roundscale_pd(
        _mm512_mul_pd(x, _mm512_set1_pd(kLog2E16)), 0x08);
    __m512d r = _mm512_fnmadd_pd(m, _mm512_set1_pd(kLn2_16Hi), x);
    r = _mm512_fnmadd_pd(m, _mm512_set1_pd(kLn2_16Lo), r);
    // degree-6 poly, Estrin (|r| <= ln2/32 -> rel err < 5e-16)
    __m512d r2 = _mm512_mul_pd(r, r);
    __m512d q01 = _mm512_fmadd_pd(r, _mm512_set1_pd(1.0),
                                  _mm512_set1_pd(1.0));
    __m512d q23 = _mm512_fmadd_pd(r, _mm512_set1_pd(1.0 / 6.0),
                                  _mm512_set1_pd(0.5));
    __m512d q45 = _mm512_fmadd_pd(r, _mm512_set1_pd(1.0 / 120.0),
                                  _mm512_set1_pd(1.0 / 24.0));
    __m512d q456 = _mm512_fmadd_pd(r2, _mm512_set1_pd(1.0 / 720.0), q45);
    __m512d p = _mm512_fmadd_pd(
        r2, _mm512_fmadd_pd(r2, q456, q23), q01);
    __m512i mi = _mm512_cvtpd_epi64(m);                // exact integers
    // 16-entry lookup: permutex2var indexes across two 8-lane registers
    // (bit 3 of the index selects the second one)
    __m512d tab = _mm512_permutex2var_pd(
        _mm512_load_pd(kTab),
        _mm512_and_epi64(mi, _mm512_set1_epi64(15)),
        _mm512_load_pd(kTab + 8));
    __m512i k = _mm512_max_epi64(_mm512_srai_epi64(mi, 4),
                                 _mm512_set1_epi64(-1022));
    __m512d sc = _mm512_castsi512_pd(_mm512_slli_epi64(
        _mm512_add_epi64(k, _mm512_set1_epi64(1023)), 52));
    return _mm512_mul_pd(_mm512_mul_pd(p, tab), sc);
}

#endif  // KDE_HOSTOPS_AVX512

// sum_j w_j exp(a * D_j) for two adjacent rows at once (independent
// accumulator chains keep the FMA pipes busy; w loads are shared).
inline void row_sum2(const double* D0, const double* D1, const double* w,
                     std::int64_t n, double a, double* s0, double* s1) {
#ifdef KDE_HOSTOPS_AVX512
    __m512d av = _mm512_set1_pd(a);
    __m512d acc0 = _mm512_setzero_pd();
    __m512d acc1 = _mm512_setzero_pd();
    std::int64_t j = 0;
    for (; j + 8 <= n; j += 8) {
        __m512d wv = _mm512_loadu_pd(w + j);
        acc0 = _mm512_fmadd_pd(
            wv, exp_neg_v(_mm512_mul_pd(av, _mm512_loadu_pd(D0 + j))),
            acc0);
        acc1 = _mm512_fmadd_pd(
            wv, exp_neg_v(_mm512_mul_pd(av, _mm512_loadu_pd(D1 + j))),
            acc1);
    }
    if (j < n) {
        __mmask8 msk = static_cast<__mmask8>((1u << (n - j)) - 1u);
        __m512d wv = _mm512_maskz_loadu_pd(msk, w + j);
        // masked lanes read 0 -> exp(0) = 1, killed by w lanes = 0
        acc0 = _mm512_fmadd_pd(
            wv,
            exp_neg_v(_mm512_mul_pd(av, _mm512_maskz_loadu_pd(msk, D0 + j))),
            acc0);
        acc1 = _mm512_fmadd_pd(
            wv,
            exp_neg_v(_mm512_mul_pd(av, _mm512_maskz_loadu_pd(msk, D1 + j))),
            acc1);
    }
    *s0 = _mm512_reduce_add_pd(acc0);
    *s1 = _mm512_reduce_add_pd(acc1);
#else
    double t0 = 0.0, t1 = 0.0;
    for (std::int64_t j = 0; j < n; ++j) {
        t0 += w[j] * exp_neg_scalar(a * D0[j]);
        t1 += w[j] * exp_neg_scalar(a * D1[j]);
    }
    *s0 = t0;
    *s1 = t1;
#endif
}

// One LOO probe: -sum_i w_i log(sum_j w_j exp(a * D_ij)) + tail.
double loo_nll(const double* D, const double* w, std::int64_t n, double a,
               double tail) {
    double acc = 0.0;
    std::int64_t i = 0;
    for (; i + 2 <= n; i += 2) {
        double s0, s1;
        row_sum2(D + i * n, D + (i + 1) * n, w, n, a, &s0, &s1);
        acc += w[i] * std::log(s0) + w[i + 1] * std::log(s1);
    }
    if (i < n) {
        double s0, s1;
        row_sum2(D + i * n, D + i * n, w, n, a, &s0, &s1);
        acc += w[i] * std::log(s0);
    }
    return tail - acc;
}

// Golden-section search over the prepared LOO matrix -- bracket arithmetic
// mirrors ops/host_small.py::_golden_scalar line for line (reference
// src/CrossValidation.jl:44-98); objective mirrors the all-positive-weight
// branch of ksize_host_np.
double golden_over_D(const double* D, const double* w, std::int64_t n,
                     double base_var, double w_dmin, double w_const,
                     double ax, double bx, double cx, double tol) {
    const double kC = (3.0 - std::sqrt(5.0)) / 2.0;
    const double kR = 1.0 - kC;
    auto nll = [&](double alpha) {
        double var = base_var * alpha * alpha;
        double a = -0.5 / var;
        double tail = -a * w_dmin - w_const + 0.5 * std::log(var);
        return loo_nll(D, w, n, a, tail);
    };
    long max_iters =
        static_cast<long>(std::ceil(std::log(tol > 1e-18 ? tol : 1e-18) /
                                    std::log(kR))) + 60;
    double x0 = ax, x3 = cx, x1, x2;
    if (std::fabs(cx - bx) > std::fabs(bx - ax)) {
        x1 = bx;
        x2 = bx + kC * (cx - bx);
    } else {
        x1 = bx - kC * (bx - ax);
        x2 = bx;
    }
    double f1 = nll(x1), f2 = nll(x2);
    long it = 0;
    while (std::fabs(x3 - x0) > tol * (std::fabs(x1) + std::fabs(x2)) &&
           it < max_iters) {
        if (f2 < f1) {
            x0 = x1;
            x1 = x2;
            x2 = kR * x2 + kC * x3;
            f1 = f2;
            f2 = nll(x2);
        } else {
            x3 = x2;
            x2 = x1;
            x1 = kR * x1 + kC * x0;
            f2 = f1;
            f1 = nll(x1);
        }
        ++it;
    }
    return f1 < f2 ? x1 : x2;
}

}  // namespace

extern "C" {

// Single probe (exposed for the parity tests).
double kde_loo_nll(const double* D, const double* w, std::int64_t n,
                   double a, double tail) {
    return loo_nll(D, w, n, a, tail);
}

// Golden search over a caller-prepared shifted LOO matrix D [n, n].
double kde_loo_golden(const double* D, const double* w, std::int64_t n,
                      double base_var, double w_dmin, double w_const,
                      double ax, double bx, double cx, double tol) {
    return golden_over_D(D, w, n, base_var, w_dmin, w_const, ax, bx, cx,
                         tol);
}

// Whole per-dimension LOOCV golden search from the raw 1-D data: builds
// the shifted LOO matrix (d2 with +inf diagonal, shifted by the row-min)
// internally -- all-positive-weight case (w_j > 0 for every j, so the
// row-min IS the nearest live neighbour).  Returns xmin; the caller
// multiplies by the base std-dev.  Mirrors the all-positive branch of
// ops/host_small.py::ksize_host_np (incl. the n==1-guard handled there).
double kde_loo_golden_1d(const double* x, const double* w, std::int64_t n,
                         double base_var, double w_const, double ax,
                         double bx, double cx, double tol) {
    std::vector<double> D(static_cast<std::size_t>(n) * n);
    double w_dmin = 0.0;
    const double inf = HUGE_VAL;
    for (std::int64_t i = 0; i < n; ++i) {
        double* Di = D.data() + i * n;
        double xi = x[i];
        double dmin = inf;
        for (std::int64_t j = 0; j < n; ++j) {
            double dx = xi - x[j];
            double v = dx * dx;
            Di[j] = v;
            if (j != i && v < dmin) dmin = v;
        }
        Di[i] = inf;
        if (!(dmin < inf)) dmin = 0.0;               // n == 1 guard
        for (std::int64_t j = 0; j < n; ++j) Di[j] -= dmin;
        Di[i] = inf;                                  // inf - dmin == inf
        w_dmin += w[i] * dmin;
    }
    return golden_over_D(D.data(), w, n, base_var, w_dmin, w_const, ax, bx,
                         cx, tol);
}

// Dense 1-D Gaussian-mixture log-eval: out[m] = log sum_j w_j
// exp(-0.5 (q_m - mu_j)^2 / var) - 0.5 log(2 pi var)  (the f64 host twin
// of evalDirect for uniform-bandwidth 1-D densities; reference
// src/DualTree01.jl:130-162).  All-positive weights; the per-query
// nearest-component shift keeps the sum from underflowing, exactly like
// the NumPy twin's logsumexp max-shift.
void kde_log_eval_1d(const double* q, std::int64_t m_count, const double* mu,
                     const double* w, std::int64_t n, double var,
                     double* out) {
    const double a = -0.5 / var;
    const double norm = -0.5 * std::log(2.0 * M_PI * var);
    std::vector<double> row(static_cast<std::size_t>(n));
    for (std::int64_t m = 0; m < m_count; ++m) {
        double qm = q[m];
        double dmin = HUGE_VAL;
        for (std::int64_t j = 0; j < n; ++j) {
            double dx = qm - mu[j];
            double v = dx * dx;
            row[j] = v;
            if (v < dmin) dmin = v;
        }
        double s = 0.0;
#ifdef KDE_HOSTOPS_AVX512
        {
            __m512d av = _mm512_set1_pd(a);
            __m512d dv = _mm512_set1_pd(dmin);
            __m512d acc = _mm512_setzero_pd();
            std::int64_t j = 0;
            for (; j + 8 <= n; j += 8) {
                __m512d x0 = _mm512_mul_pd(
                    av, _mm512_sub_pd(_mm512_loadu_pd(row.data() + j), dv));
                acc = _mm512_fmadd_pd(_mm512_loadu_pd(w + j),
                                      exp_neg_v(x0), acc);
            }
            if (j < n) {
                __mmask8 msk =
                    static_cast<__mmask8>((1u << (n - j)) - 1u);
                // zero the MASKED lanes of the exp argument: a masked row
                // load reads 0.0, so an unmasked multiply would feed
                // a*(0 - dmin) > 0 to exp_neg_v (contract: x <= 0) -- in
                // the exponent-wrap window (0.5*dmin/var ~ 709.8-710.5 or
                // +1419.6k) its 2^k scale becomes +inf and
                // fmadd(w=0, inf, acc) poisons the accumulator with NaN
                __m512d x0 = _mm512_maskz_mul_pd(
                    msk, av,
                    _mm512_sub_pd(
                        _mm512_maskz_loadu_pd(msk, row.data() + j), dv));
                acc = _mm512_fmadd_pd(_mm512_maskz_loadu_pd(msk, w + j),
                                      exp_neg_v(x0), acc);
            }
            s = _mm512_reduce_add_pd(acc);
        }
#else
        for (std::int64_t j = 0; j < n; ++j) {
            s += w[j] * exp_neg_scalar(a * (row[j] - dmin));
        }
#endif
        out[m] = std::log(s) + a * dmin + norm;
    }
}

}  // extern "C"
