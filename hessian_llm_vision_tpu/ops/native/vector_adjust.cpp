// Host-side rank-k spectral gradient transforms.
//
// TPU-native counterpart of the reference's CUDA kernel
// (/root/reference/vector_adjust.cu) for the HOST path: when the Krylov
// basis is offloaded to host memory (the reference's _cpu variants,
// gpt2_hessian_cpu.py:207-228), the adjustment runs here directly on the
// offloaded basis — no k x P device transfer.  Unlike the reference kernel
// (which recomputes every dot product per output element, O(k*P^2)), this
// is the O(k*P) two-pass form, OpenMP-parallel and vectorizable.
//
// Build: make (g++ -O3 -march=native -fopenmp -shared -fPIC), mirroring the
// reference's one-line nvcc build (/root/reference/shared_kernel:1).

#include <cstdint>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// out = g + V^T diag(coeffs) (V g);  V is row-major (k, p), g/out len p.
// out may alias g.
void rank_k_apply(const float* g, const float* V, const float* coeffs,
                  float* out, int64_t k, int64_t p) {
    // pass 1: dots[i] = <V[i,:], g>
    double* dots = new double[k];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < k; ++i) {
        const float* row = V + i * p;
        double acc = 0.0;
        for (int64_t j = 0; j < p; ++j) acc += (double)row[j] * (double)g[j];
        dots[i] = acc * (double)coeffs[i];
    }
    // pass 2: out = g + sum_i dots[i] * V[i,:]
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        double acc = (double)g[j];
        for (int64_t i = 0; i < k; ++i)
            acc += dots[i] * (double)V[i * p + j];
        out[j] = (float)acc;
    }
    delete[] dots;
}

// The reference formula: coeffs[i] = 1/eig[i] - 1/(eig[i]+delta)
// (vector_adjust.cu line 9 / gpt2_hessian.py:201).
void spectral_adjust(const float* g, const float* V, const float* eigvals,
                     float* out, int64_t k, int64_t p, float delta) {
    float* coeffs = new float[k];
    for (int64_t i = 0; i < k; ++i)
        coeffs[i] = 1.0f / eigvals[i] - 1.0f / (eigvals[i] + delta);
    rank_k_apply(g, V, coeffs, out, k, p);
    delete[] coeffs;
}

// g - sum_i (v_i . g) v_i   (load_model.py:350-364)
void project_out(const float* g, const float* V, float* out,
                 int64_t k, int64_t p) {
    float* coeffs = new float[k];
    for (int64_t i = 0; i < k; ++i) coeffs[i] = -1.0f;
    rank_k_apply(g, V, coeffs, out, k, p);
    delete[] coeffs;
}

int num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
