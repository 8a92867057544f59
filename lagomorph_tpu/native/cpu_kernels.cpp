// Native CPU reference kernels for lagomorph_tpu.
//
// Role: the independent non-JAX oracle used by the parity test-suite and as
// a host-side fast path for data standardization — the same role the
// reference's C++ CPU implementation plays for its CUDA kernels
// (reference: lagomorph/extension/cpu/affine.cpp).  Fresh implementation;
// semantics: CLAMP boundary, floor-then-clamp corner rule, weights from the
// unclamped coordinate (see lagomorph_tpu/ops/sampling.py docstring).
//
// Build: g++ -O3 -shared -fPIC -o libcpu_kernels.so cpu_kernels.cpp -fopenmp
// (see build.py; OpenMP optional).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

inline int64_t clampi(int64_t v, int64_t n) {
    return v < 0 ? 0 : (v >= n ? n - 1 : v);
}

// Clamped multilinear sample of one channel at fractional point p[dim].
template <typename T, int DIM>
T sample_point(const T* img, const int64_t* shape, const double* p) {
    int64_t lo[DIM];
    double w[DIM];
    for (int d = 0; d < DIM; ++d) {
        double f = std::floor(p[d]);
        lo[d] = (int64_t)f;
        w[d] = p[d] - f;
    }
    T acc = 0;
    for (int corner = 0; corner < (1 << DIM); ++corner) {
        int64_t idx = 0;
        double weight = 1.0;
        for (int d = 0; d < DIM; ++d) {
            int bit = (corner >> d) & 1;
            int64_t c = clampi(lo[d] + bit, shape[d]);
            idx = idx * shape[d] + c;
            weight *= bit ? w[d] : (1.0 - w[d]);
        }
        acc += (T)(weight * (double)img[idx]);
    }
    return acc;
}

template <typename T, int DIM>
void interp_impl(T* out, const T* I, const T* u, double dt,
                 int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    int64_t nvox = 1;
    for (int d = 0; d < DIM; ++d) nvox *= sp[d];
#pragma omp parallel for
    for (int64_t v = 0; v < n * nvox; ++v) {
        int64_t b = v / nvox;
        int64_t lin = v % nvox;
        // decode voxel coords
        int64_t coord[DIM];
        int64_t rem = lin;
        for (int d = DIM - 1; d >= 0; --d) {
            coord[d] = rem % sp[d];
            rem /= sp[d];
        }
        double p[DIM];
        const T* ub = u + b * DIM * nvox;
        for (int d = 0; d < DIM; ++d)
            p[d] = (double)coord[d] + dt * (double)ub[d * nvox + lin];
        const T* Ib = I + (nI == 1 ? 0 : b) * nc * nvox;
        T* ob = out + b * nc * nvox;
        for (int64_t c = 0; c < nc; ++c)
            ob[c * nvox + lin] = sample_point<T, DIM>(Ib + c * nvox, sp, p);
    }
}

template <typename T, int DIM>
void affine_interp_impl(T* out, const T* I, const T* A, const T* Tv,
                        int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    int64_t nvox = 1;
    for (int d = 0; d < DIM; ++d) nvox *= sp[d];
    double o[DIM];
    for (int d = 0; d < DIM; ++d) o[d] = 0.5 * (double)(sp[d] - 1);
#pragma omp parallel for
    for (int64_t v = 0; v < n * nvox; ++v) {
        int64_t b = v / nvox;
        int64_t lin = v % nvox;
        int64_t coord[DIM];
        int64_t rem = lin;
        for (int d = DIM - 1; d >= 0; --d) {
            coord[d] = rem % sp[d];
            rem /= sp[d];
        }
        const T* Ab = A + b * DIM * DIM;
        const T* Tb = Tv + b * DIM;
        double p[DIM];
        for (int a = 0; a < DIM; ++a) {
            double acc = (double)Tb[a] + o[a];
            for (int d = 0; d < DIM; ++d)
                acc += (double)Ab[a * DIM + d] * ((double)coord[d] - o[d]);
            p[a] = acc;
        }
        const T* Ib = I + (nI == 1 ? 0 : b) * nc * nvox;
        T* ob = out + b * nc * nvox;
        for (int64_t c = 0; c < nc; ++c)
            ob[c * nvox + lin] = sample_point<T, DIM>(Ib + c * nvox, sp, p);
    }
}

}  // namespace

extern "C" {

// out: (n, nc, *sp); I: (nI, nc, *sp) with nI in {1, n}; u: (n, DIM, *sp)
void interp2d_f32(float* out, const float* I, const float* u, double dt,
                  int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    interp_impl<float, 2>(out, I, u, dt, n, nI, nc, sp);
}
void interp3d_f32(float* out, const float* I, const float* u, double dt,
                  int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    interp_impl<float, 3>(out, I, u, dt, n, nI, nc, sp);
}
void interp2d_f64(double* out, const double* I, const double* u, double dt,
                  int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    interp_impl<double, 2>(out, I, u, dt, n, nI, nc, sp);
}
void interp3d_f64(double* out, const double* I, const double* u, double dt,
                  int64_t n, int64_t nI, int64_t nc, const int64_t* sp) {
    interp_impl<double, 3>(out, I, u, dt, n, nI, nc, sp);
}

void affine_interp2d_f32(float* out, const float* I, const float* A,
                         const float* T, int64_t n, int64_t nI, int64_t nc,
                         const int64_t* sp) {
    affine_interp_impl<float, 2>(out, I, A, T, n, nI, nc, sp);
}
void affine_interp3d_f32(float* out, const float* I, const float* A,
                         const float* T, int64_t n, int64_t nI, int64_t nc,
                         const int64_t* sp) {
    affine_interp_impl<float, 3>(out, I, A, T, n, nI, nc, sp);
}
void affine_interp2d_f64(double* out, const double* I, const double* A,
                         const double* T, int64_t n, int64_t nI, int64_t nc,
                         const int64_t* sp) {
    affine_interp_impl<double, 2>(out, I, A, T, n, nI, nc, sp);
}
void affine_interp3d_f64(double* out, const double* I, const double* A,
                         const double* T, int64_t n, int64_t nI, int64_t nc,
                         const int64_t* sp) {
    affine_interp_impl<double, 3>(out, I, A, T, n, nI, nc, sp);
}

}  // extern "C"
