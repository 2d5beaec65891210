// Native CSR SpGEMM/SpAdd oracle on the saturating-u64 semiring.
//
// Plays the role of the reference's hand-written CPU kernels
// (CsrMatrix::matmul, src/graph_csr.rs:306-346; matmul_par :350-484):
// a fast, exact host-side comparator for large-scale differential tests
// and CPU-baseline measurements.  Two-pass symbolic+numeric Gustavson with
// a dense accumulator per row and optional std::thread row-parallelism
// (the rayon analog; disjoint writes via per-row exact offsets).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint64_t sat_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    return s < a ? UINT64_MAX : s;
}

inline uint64_t sat_mul(uint64_t a, uint64_t b) {
    if (a == 0 || b == 0) return 0;
    unsigned __int128 p = (unsigned __int128)a * b;
    return p > UINT64_MAX ? UINT64_MAX : (uint64_t)p;
}

struct Csr {
    const int64_t* row_ptr;
    const int32_t* col_idx;
    const uint64_t* values;
    int64_t n;
};

void spgemm_rows(const Csr& a, const Csr& b, int64_t r0, int64_t r1,
                 int64_t* out_row_nnz,            // pass 1 output (size n)
                 int64_t* out_row_ptr,            // pass 2 input (size n+1)
                 int32_t* out_col, uint64_t* out_val,  // pass 2 outputs
                 bool numeric) {
    std::vector<uint64_t> acc(b.n, 0);
    std::vector<int32_t> touched;
    touched.reserve(1024);
    for (int64_t i = r0; i < r1; ++i) {
        touched.clear();
        for (int64_t p = a.row_ptr[i]; p < a.row_ptr[i + 1]; ++p) {
            int32_t k = a.col_idx[p];
            uint64_t a_ik = a.values[p];
            for (int64_t q = b.row_ptr[k]; q < b.row_ptr[k + 1]; ++q) {
                int32_t j = b.col_idx[q];
                if (acc[j] == 0) touched.push_back(j);
                acc[j] = sat_add(acc[j], sat_mul(a_ik, b.values[q]));
            }
        }
        std::sort(touched.begin(), touched.end());
        if (numeric) {
            int64_t pos = out_row_ptr[i];
            for (int32_t j : touched) {
                if (acc[j] != 0) {
                    out_col[pos] = j;
                    out_val[pos] = acc[j];
                    ++pos;
                }
                acc[j] = 0;
            }
        } else {
            int64_t cnt = 0;
            for (int32_t j : touched) {
                if (acc[j] != 0) ++cnt;
                acc[j] = 0;
            }
            out_row_nnz[i] = cnt;
        }
    }
}

void run_parallel(int64_t n, int n_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
    if (n_threads <= 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = std::min(n, r0 + chunk);
        if (r0 >= r1) break;
        threads.emplace_back(fn, r0, r1);
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Pass 1: exact per-row output nnz -> row_ptr (size n+1, caller-allocated).
// Returns total output nnz.
int64_t spgemm_u64_symbolic(
    int64_t n,
    const int64_t* a_row_ptr, const int32_t* a_col, const uint64_t* a_val,
    const int64_t* b_row_ptr, const int32_t* b_col, const uint64_t* b_val,
    int64_t* c_row_ptr, int32_t n_threads) {
    Csr a{a_row_ptr, a_col, a_val, n};
    Csr b{b_row_ptr, b_col, b_val, n};
    std::vector<int64_t> row_nnz(n, 0);
    run_parallel(n, n_threads, [&](int64_t r0, int64_t r1) {
        spgemm_rows(a, b, r0, r1, row_nnz.data(), nullptr, nullptr, nullptr,
                    false);
    });
    c_row_ptr[0] = 0;
    for (int64_t i = 0; i < n; ++i) c_row_ptr[i + 1] = c_row_ptr[i] + row_nnz[i];
    return c_row_ptr[n];
}

// Pass 2: fill col/val arrays sized by the symbolic pass.
void spgemm_u64_numeric(
    int64_t n,
    const int64_t* a_row_ptr, const int32_t* a_col, const uint64_t* a_val,
    const int64_t* b_row_ptr, const int32_t* b_col, const uint64_t* b_val,
    const int64_t* c_row_ptr, int32_t* c_col, uint64_t* c_val,
    int32_t n_threads) {
    Csr a{a_row_ptr, a_col, a_val, n};
    Csr b{b_row_ptr, b_col, b_val, n};
    run_parallel(n, n_threads, [&](int64_t r0, int64_t r1) {
        spgemm_rows(a, b, r0, r1, nullptr, const_cast<int64_t*>(c_row_ptr),
                    c_col, c_val, true);
    });
}

// Elementwise saturating add of two sorted CSR matrices.
// Returns output nnz; caller provides capacity >= nnz(a)+nnz(b).
int64_t spadd_u64(
    int64_t n,
    const int64_t* a_row_ptr, const int32_t* a_col, const uint64_t* a_val,
    const int64_t* b_row_ptr, const int32_t* b_col, const uint64_t* b_val,
    int64_t* c_row_ptr, int32_t* c_col, uint64_t* c_val) {
    int64_t pos = 0;
    c_row_ptr[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t pa = a_row_ptr[i], ea = a_row_ptr[i + 1];
        int64_t pb = b_row_ptr[i], eb = b_row_ptr[i + 1];
        while (pa < ea || pb < eb) {
            int32_t ca = pa < ea ? a_col[pa] : INT32_MAX;
            int32_t cb = pb < eb ? b_col[pb] : INT32_MAX;
            if (ca < cb) {
                c_col[pos] = ca;
                c_val[pos++] = a_val[pa++];
            } else if (cb < ca) {
                c_col[pos] = cb;
                c_val[pos++] = b_val[pb++];
            } else {
                uint64_t v = sat_add(a_val[pa], b_val[pb]);
                if (v != 0) {
                    c_col[pos] = ca;
                    c_val[pos++] = v;
                }
                ++pa;
                ++pb;
            }
        }
        c_row_ptr[i + 1] = pos;
    }
    return pos;
}

}  // extern "C"
