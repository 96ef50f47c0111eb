// planlib — C++ host-side planning kernels for ssqueezepy_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; plan construction (scale
// selection, redundancy detection) runs on host at trace time. The
// reference implements its host hot loops with Numba JIT (e.g.
// `find_downsampling_scale`'s per-group scan, reference
// ssqueezepy/utils/cwt_utils.py:459-580); here the equivalents are plain
// C++ compiled once (see native/__init__.py for the ctypes loader and the
// Python fallback used when no toolchain is available).
//
// Semantics are bit-identical to the Python implementations in
// ../utils/cwt_utils.py — the unit tests assert native == python.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Index of the first scale where freq-domain wavelets become excessively
// redundant. Psih is (na, Nh) row-major (right half already trimmed).
// method: 0='any', 1='all', 2='sum'. Returns -1 for "None".
long long find_downsampling_scale(const double* Psih, long long na,
                                  long long Nh, long long span, double tol,
                                  double nonzero_th, double nonzero_tol,
                                  int method) {
    const long long n_groups = na - span - 1;
    if (n_groups <= 0) return -1;

    std::vector<double> rowmax((size_t)span);
    std::vector<double> prod((size_t)Nh);

    long long i = -1;
    for (i = 0; i < n_groups; ++i) {
        const double* G = Psih + (size_t)i * Nh;

        // per-row maxima
        for (long long r = 0; r < span; ++r) {
            const double* row = G + (size_t)r * Nh;
            double m = row[0];
            for (long long c = 1; c < Nh; ++c) m = row[c] > m ? row[c] : m;
            rowmax[(size_t)r] = m;
        }

        // nonzero-support density gate
        long long nonzeros = 0;
        for (long long r = 0; r < span; ++r) {
            const double* row = G + (size_t)r * Nh;
            const double th = nonzero_th * rowmax[(size_t)r];
            for (long long c = 0; c < Nh; ++c)
                nonzeros += (row[c] > th);
        }
        if ((double)nonzeros / (double)span > nonzero_tol) continue;

        // joint peak: argmax over columns of the row product
        for (long long c = 0; c < Nh; ++c) prod[(size_t)c] = 1.0;
        for (long long r = 0; r < span; ++r) {
            const double* row = G + (size_t)r * Nh;
            for (long long c = 0; c < Nh; ++c) prod[(size_t)c] *= row[c];
        }
        long long joint_peak = 0;
        double pmax = prod[0];
        for (long long c = 1; c < Nh; ++c)
            if (prod[(size_t)c] > pmax) { pmax = prod[(size_t)c]; joint_peak = c; }

        // peak distances (every tie of the row max counts, matching
        // np.where(psihs == rowmax))
        double dsum = 0.0;
        double dmax = 0.0;
        bool all_gt = true;
        for (long long r = 0; r < span; ++r) {
            const double* row = G + (size_t)r * Nh;
            for (long long c = 0; c < Nh; ++c) {
                if (row[c] == rowmax[(size_t)r]) {
                    double d = (double)(c > joint_peak ? c - joint_peak
                                                       : joint_peak - c);
                    dsum += d;
                    dmax = d > dmax ? d : dmax;
                    if (!(d > tol)) all_gt = false;
                }
            }
        }
        const bool too_dense =
            (method == 0 && dmax < tol) ||
            (method == 1 && !all_gt) ||
            (method == 2 && dsum < tol);
        if (too_dense) break;
    }
    return (i >= 0 && i < n_groups - 1) ? i : -1;
}

// Forward pass of the ridge-extraction dynamic program (reference
// ridge_extraction.py:169-183): pen_e[f,t] = energy[f,t] +
// min_j(pen_e[j,t-1] + penalty[f,j]), tracking argmins. Host fallback /
// reference implementation; the device path is a lax.scan.
void ridge_dp_forward(const double* energy, const double* penalty,
                      long long nf, long long nt, double* pen_e,
                      int32_t* argmins) {
    for (long long f = 0; f < nf; ++f) pen_e[f * nt] = energy[f * nt];
    for (long long t = 1; t < nt; ++t) {
        for (long long f = 0; f < nf; ++f) {
            double best = pen_e[0 * nt + (t - 1)] + penalty[f * nf + 0];
            long long bj = 0;
            for (long long j = 1; j < nf; ++j) {
                const double v = pen_e[j * nt + (t - 1)] + penalty[f * nf + j];
                if (v < best) { best = v; bj = j; }
            }
            pen_e[f * nt + t] = energy[f * nt + t] + best;
            argmins[f * nt + t] = (int32_t)bj;
        }
    }
}

}  // extern "C"
