// Native host kernels for ginkgo_tpu.
//
// The reference implements its runtime tier in C++; the TPU build keeps the
// compute path in XLA/Pallas, and this library provides the C++ host tier
// for the work that stays on the CPU and is too slow in Python:
//   * MatrixMarket coordinate parsing (mtx_io.hpp read_raw analog)
//   * triangular level-set computation (sparsity analysis of
//     cuda/solver/common_trs_kernels.cuh's level scheduling)
//   * ILU contribution-pair enumeration (csr_lookup-style symbolics feeding
//     the ParILU/ParILUT device sweeps)
//   * COO canonicalization (sort_row_major + sum_duplicates kernels of
//     core/base/device_matrix_data_kernels.hpp)
//
// Exposed as a plain C ABI consumed via ctypes; every entry point has a
// numpy fallback on the Python side, so the library is an accelerator, not
// a hard dependency.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <type_traits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MatrixMarket coordinate reader.
// Pass 1: gt_mtx_open parses the header and returns dims + nnz (and keeps
// no state); pass 2: gt_mtx_read re-opens and fills caller-allocated arrays.
// Returns 0 on success, negative error codes otherwise.
// ---------------------------------------------------------------------------

static int parse_header(FILE* f, char* fmt, char* field, char* symm,
                        int64_t* nrows, int64_t* ncols, int64_t* nnz) {
    char line[1024];
    if (!fgets(line, sizeof line, f)) return -2;
    char banner[64], object[64];
    if (sscanf(line, "%63s %63s %63s %63s %63s", banner, object, fmt, field,
               symm) != 5)
        return -3;
    if (strcmp(banner, "%%MatrixMarket") != 0 || strcmp(object, "matrix"))
        return -3;
    for (char* p = fmt; *p; ++p) *p = (char)tolower(*p);
    for (char* p = field; *p; ++p) *p = (char)tolower(*p);
    for (char* p = symm; *p; ++p) *p = (char)tolower(*p);
    // skip comments
    do {
        if (!fgets(line, sizeof line, f)) return -4;
    } while (line[0] == '%' || line[0] == '\n' || line[0] == '\r');
    if (strcmp(fmt, "coordinate") == 0) {
        if (sscanf(line, "%ld %ld %ld", (long*)nrows, (long*)ncols,
                   (long*)nnz) != 3)
            return -5;
    } else {
        if (sscanf(line, "%ld %ld", (long*)nrows, (long*)ncols) != 2)
            return -5;
        *nnz = (*nrows) * (*ncols);
    }
    return 0;
}

int gt_mtx_header(const char* path, int64_t* nrows, int64_t* ncols,
                  int64_t* nnz, int32_t* is_complex, int32_t* is_pattern,
                  int32_t* symmetry /*0 gen,1 sym,2 herm,3 skew*/,
                  int32_t* is_coordinate) {
    FILE* f = fopen(path, "r");
    if (!f) return -1;
    char fmt[64], field[64], symm[64];
    int rc = parse_header(f, fmt, field, symm, nrows, ncols, nnz);
    fclose(f);
    if (rc) return rc;
    *is_coordinate = strcmp(fmt, "coordinate") == 0;
    *is_complex = strcmp(field, "complex") == 0;
    *is_pattern = strcmp(field, "pattern") == 0;
    *symmetry = strcmp(symm, "symmetric") == 0    ? 1
                : strcmp(symm, "hermitian") == 0  ? 2
                : strcmp(symm, "skew-symmetric") == 0 ? 3
                                                      : 0;
    return 0;
}

// strtod-based fast line scanning; fills rows/cols (0-based) and values
// (interleaved re/im when complex).
int gt_mtx_read_coord(const char* path, int64_t nnz, int32_t is_complex,
                      int32_t is_pattern, int64_t* rows, int64_t* cols,
                      double* vals) {
    FILE* f = fopen(path, "r");
    if (!f) return -1;
    char fmt[64], field[64], symm[64];
    int64_t nr, nc, nz;
    int rc = parse_header(f, fmt, field, symm, &nr, &nc, &nz);
    if (rc) {
        fclose(f);
        return rc;
    }
    // stream entries with strtol/strtod (much faster than Python splits)
    std::vector<char> buf(1 << 20);
    setvbuf(f, buf.data(), _IOFBF, buf.size());
    char line[1024];
    for (int64_t k = 0; k < nnz; ++k) {
        if (!fgets(line, sizeof line, f)) {
            fclose(f);
            return -6;
        }
        char* p = line;
        char* q = p;
        rows[k] = strtol(p, &q, 10) - 1;
        if (q == p) {   // malformed/blank line: strtol consumed nothing
            fclose(f);
            return -7;
        }
        p = q;
        cols[k] = strtol(p, &q, 10) - 1;
        if (q == p) {
            fclose(f);
            return -7;
        }
        p = q;
        if (rows[k] < 0 || rows[k] >= nr || cols[k] < 0 || cols[k] >= nc) {
            fclose(f);
            return -8;  // index out of the declared dimensions
        }
        if (is_pattern) {
            vals[k] = 1.0;
        } else if (is_complex) {
            vals[2 * k] = strtod(p, &q);
            if (q == p) { fclose(f); return -7; }
            p = q;
            vals[2 * k + 1] = strtod(p, &q);
            if (q == p) { fclose(f); return -7; }
        } else {
            vals[k] = strtod(p, &q);
            if (q == p) { fclose(f); return -7; }
        }
    }
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// Triangular level sets: level[r] = 1 + max(level[deps]) over the rows'
// off-diagonal entries.  rows must be sorted ascending; ptr is the CSR-style
// row pointer into (rows, cols).
// ---------------------------------------------------------------------------
int gt_compute_levels(int64_t n, const int64_t* ptr, const int64_t* cols,
                      int32_t lower, int64_t* level) {
    if (lower) {
        for (int64_t r = 0; r < n; ++r) {
            int64_t lv = 0;
            for (int64_t e = ptr[r]; e < ptr[r + 1]; ++e) {
                int64_t c = cols[e];
                if (c < r && level[c] + 1 > lv) lv = level[c] + 1;
            }
            level[r] = lv;
        }
    } else {
        for (int64_t r = n - 1; r >= 0; --r) {
            int64_t lv = 0;
            for (int64_t e = ptr[r]; e < ptr[r + 1]; ++e) {
                int64_t c = cols[e];
                if (c > r && level[c] + 1 > lv) lv = level[c] + 1;
            }
            level[r] = lv;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// ILU contribution pairs: for every output entry (i,j) in L (i>j, first
// nl outputs) or U (i<=j), enumerate (l_idx, u_idx) with
// lc[l_idx] == ur[u_idx] == k and k < min(i, j).
// Two-phase: count, then fill (caller allocates).
// L entries are sorted by row; U entries sorted by column via a CSC-style
// permutation built here.
// ---------------------------------------------------------------------------
static int64_t ilu_pairs_impl(int64_t n, int64_t nl, const int64_t* lr,
                              const int64_t* lc, int64_t nu,
                              const int64_t* ur, const int64_t* uc,
                              int64_t* out_l, int64_t* out_u,
                              int64_t* out_o) {
    // group L entries by row, U entries by column
    std::vector<int64_t> lptr(n + 1, 0), uptr(n + 1, 0);
    for (int64_t e = 0; e < nl; ++e) lptr[lr[e] + 1]++;
    for (int64_t e = 0; e < nu; ++e) uptr[uc[e] + 1]++;
    for (int64_t i = 0; i < n; ++i) {
        lptr[i + 1] += lptr[i];
        uptr[i + 1] += uptr[i];
    }
    std::vector<int64_t> lidx(nl), uidx(nu), lpos(lptr.begin(),
                                                  lptr.end() - 1),
        upos(uptr.begin(), uptr.end() - 1);
    for (int64_t e = 0; e < nl; ++e) lidx[lpos[lr[e]]++] = e;
    for (int64_t e = 0; e < nu; ++e) uidx[upos[uc[e]]++] = e;
    // U-row lookup per column entry: map (k -> u_idx) per column j via a
    // scratch array indexed by k
    std::vector<int64_t> urow_of(n, -1);
    int64_t count = 0;
    bool fill = out_l != nullptr;
    // process outputs column-by-... we need per (i, j). Iterate outputs:
    // for L entry o at (i, j): pairs = L-row(i) ∩ U-col(j) with k < j.
    // Build per-column map on demand: group outputs by their column.
    // Simpler O(total * log)-free approach: for each column j, mark U-col(j)
    // entries in urow_of, then scan all outputs with that column.
    // Outputs with column j: L entries (i > j) and U entries (i <= j).
    // Group both by column:
    std::vector<int64_t> lcol_ptr(n + 1, 0), ucol_ptr = uptr;
    for (int64_t e = 0; e < nl; ++e) lcol_ptr[lc[e] + 1]++;
    for (int64_t i = 0; i < n; ++i) lcol_ptr[i + 1] += lcol_ptr[i];
    std::vector<int64_t> lcol_idx(nl),
        lcpos(lcol_ptr.begin(), lcol_ptr.end() - 1);
    for (int64_t e = 0; e < nl; ++e) lcol_idx[lcpos[lc[e]]++] = e;

    for (int64_t j = 0; j < n; ++j) {
        // mark U column j: k -> u_idx
        for (int64_t t = uptr[j]; t < uptr[j + 1]; ++t) {
            int64_t e = uidx[t];
            urow_of[ur[e]] = e;
        }
        // L outputs in column j
        for (int64_t t = lcol_ptr[j]; t < lcol_ptr[j + 1]; ++t) {
            int64_t o = lcol_idx[t];
            int64_t i = lr[o];
            int64_t lim = i < j ? i : j;
            for (int64_t s = lptr[i]; s < lptr[i + 1]; ++s) {
                int64_t le = lidx[s];
                int64_t k = lc[le];
                if (k < lim && urow_of[k] >= 0) {
                    if (fill) {
                        out_l[count] = le;
                        out_u[count] = urow_of[k];
                        out_o[count] = o;
                    }
                    ++count;
                }
            }
        }
        // U outputs in column j
        for (int64_t t = uptr[j]; t < uptr[j + 1]; ++t) {
            int64_t o = uidx[t];
            int64_t i = ur[o];
            int64_t lim = i < j ? i : j;
            for (int64_t s = lptr[i]; s < lptr[i + 1]; ++s) {
                int64_t le = lidx[s];
                int64_t k = lc[le];
                if (k < lim && urow_of[k] >= 0) {
                    if (fill) {
                        out_l[count] = le;
                        out_u[count] = urow_of[k];
                        out_o[count] = nl + o;
                    }
                    ++count;
                }
            }
        }
        // unmark
        for (int64_t t = uptr[j]; t < uptr[j + 1]; ++t)
            urow_of[ur[uidx[t]]] = -1;
    }
    return count;
}

int64_t gt_ilu_pairs_count(int64_t n, int64_t nl, const int64_t* lr,
                           const int64_t* lc, int64_t nu, const int64_t* ur,
                           const int64_t* uc) {
    return ilu_pairs_impl(n, nl, lr, lc, nu, ur, uc, nullptr, nullptr,
                          nullptr);
}

int64_t gt_ilu_pairs_fill(int64_t n, int64_t nl, const int64_t* lr,
                          const int64_t* lc, int64_t nu, const int64_t* ur,
                          const int64_t* uc, int64_t* out_l, int64_t* out_u,
                          int64_t* out_o) {
    return ilu_pairs_impl(n, nl, lr, lc, nu, ur, uc, out_l, out_u, out_o);
}

// ---------------------------------------------------------------------------
// COO canonicalization: stable sort by (row, col) + duplicate summation.
// Returns the deduplicated count; arrays are compacted in place.
// ---------------------------------------------------------------------------
int64_t gt_coo_canonicalize(int64_t nnz, int64_t* rows, int64_t* cols,
                            double* vals, int32_t is_complex) {
    std::vector<int64_t> order(nnz);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) {
                         if (rows[a] != rows[b]) return rows[a] < rows[b];
                         return cols[a] < cols[b];
                     });
    std::vector<int64_t> r2(nnz), c2(nnz);
    int64_t vw = is_complex ? 2 : 1;
    std::vector<double> v2(nnz * vw);
    for (int64_t k = 0; k < nnz; ++k) {
        r2[k] = rows[order[k]];
        c2[k] = cols[order[k]];
        for (int64_t w = 0; w < vw; ++w)
            v2[k * vw + w] = vals[order[k] * vw + w];
    }
    int64_t out = -1;
    for (int64_t k = 0; k < nnz; ++k) {
        if (out >= 0 && r2[k] == rows[out] && c2[k] == cols[out]) {
            for (int64_t w = 0; w < vw; ++w) vals[out * vw + w] += v2[k * vw + w];
        } else {
            ++out;
            rows[out] = r2[k];
            cols[out] = c2[k];
            for (int64_t w = 0; w < vw; ++w) vals[out * vw + w] = v2[k * vw + w];
        }
    }
    return out + 1;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ParILU(T) Gauss-Seidel sweep — the reference's compute_l_u_factors
// (reference/factorization/par_ilut_kernels.cpp:239): row-major in-place
// updates (sequential asynchronous Chow-Patel, which converges where the
// synchronous Jacobi form diverges).
//   L: strict-lower CSR (unit diagonal implicit), values updated in place
//   U: stored ONCE as U^T CSR (per column, rows ascending, diag last);
//      iteration follows U's row-major order via the u2ut position map
//   A: CSR for the a(row, col) lookups (pattern may exceed A's)
// ---------------------------------------------------------------------------
namespace {

template <class V>
void parilut_sweep_impl(int64_t n, const int64_t* a_ptr,
                        const int64_t* a_cols, const V* a_vals,
                        const int64_t* l_ptr, const int64_t* l_cols,
                        V* l_vals, const int64_t* u_ptr,
                        const int64_t* u_cols, const int64_t* u2ut,
                        const int64_t* ut_ptr, const int64_t* ut_rows,
                        V* ut_vals, int64_t iterations) {
    auto a_at = [&](int64_t row, int64_t col) -> V {
        const int64_t* b = a_cols + a_ptr[row];
        const int64_t* e = a_cols + a_ptr[row + 1];
        const int64_t* it = std::lower_bound(b, e, col);
        if (it != e && *it == col) return a_vals[it - a_cols];
        return V(0);
    };
    auto dot = [&](int64_t row, int64_t col) -> V {
        // sum_{k < min(row, col)} l(row, k) * u(k, col), merge walk
        V sum(0);
        int64_t lim = row < col ? row : col;
        int64_t s = l_ptr[row], se = l_ptr[row + 1];
        int64_t t = ut_ptr[col], te = ut_ptr[col + 1];
        while (s < se && t < te) {
            int64_t k = l_cols[s], k2 = ut_rows[t];
            if (k == k2) {
                if (k < lim) sum += l_vals[s] * ut_vals[t];
                ++s;
                ++t;
            } else if (k < k2) {
                ++s;
            } else {
                ++t;
            }
        }
        return sum;
    };
    auto finite = [](V v) {
        double re, im = 0;
        if constexpr (std::is_same_v<V, std::complex<double>>) {
            re = v.real();
            im = v.imag();
        } else {
            re = v;
        }
        return std::isfinite(re) && std::isfinite(im);
    };
    for (int64_t it = 0; it < iterations; ++it) {
        for (int64_t row = 0; row < n; ++row) {
            for (int64_t p = l_ptr[row]; p < l_ptr[row + 1]; ++p) {
                int64_t col = l_cols[p];
                V u_diag = ut_vals[ut_ptr[col + 1] - 1];
                V nv = (a_at(row, col) - dot(row, col)) / u_diag;
                if (finite(nv)) l_vals[p] = nv;
            }
            for (int64_t p = u_ptr[row]; p < u_ptr[row + 1]; ++p) {
                int64_t col = u_cols[p];
                V nv = a_at(row, col) - dot(row, col);
                if (finite(nv)) ut_vals[u2ut[p]] = nv;
            }
        }
    }
}

}  // namespace

extern "C" int gt_parilut_sweep(int64_t n, const int64_t* a_ptr, const int64_t* a_cols,
                     const double* a_vals, const int64_t* l_ptr,
                     const int64_t* l_cols, double* l_vals,
                     const int64_t* u_ptr, const int64_t* u_cols,
                     const int64_t* u2ut, const int64_t* ut_ptr,
                     const int64_t* ut_rows, double* ut_vals,
                     int64_t iterations, int32_t is_complex) {
    if (is_complex) {
        parilut_sweep_impl<std::complex<double>>(
            n, a_ptr, a_cols,
            reinterpret_cast<const std::complex<double>*>(a_vals), l_ptr,
            l_cols, reinterpret_cast<std::complex<double>*>(l_vals), u_ptr,
            u_cols, u2ut, ut_ptr, ut_rows,
            reinterpret_cast<std::complex<double>*>(ut_vals), iterations);
    } else {
        parilut_sweep_impl<double>(n, a_ptr, a_cols, a_vals, l_ptr, l_cols,
                                   l_vals, u_ptr, u_cols, u2ut, ut_ptr,
                                   ut_rows, ut_vals, iterations);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// MC64 maximum-weight bipartite matching (core/reorder/mc64.cpp analog):
// sparse shortest-augmenting-path assignment (Duff-Koster / sparse
// Jonker-Volgenant) with column dual potentials.
//   c:        nonnegative minimization weights (row_max - log2|a|),
//             +inf marks a structural hole (zero entry)
//   dual_u:   in: initial column duals (min over rows of c), out: final
//   p/ip:     row->col and col->row matching (-1 while unmatched)
//   midx:     matched CSR edge index per row (for the scaling recovery)
// Returns 0, or -1 when the matrix is structurally singular.
// ---------------------------------------------------------------------------
#include <limits>
#include <queue>

extern "C" int gt_mc64_match(int64_t n, const int64_t* ptr,
                             const int64_t* cols, const double* c,
                             double* dual_u, int64_t* p, int64_t* ip,
                             int64_t* midx, double tol) {
    const double inf = std::numeric_limits<double>::infinity();
    for (int64_t i = 0; i < n; ++i) p[i] = ip[i] = midx[i] = -1;

    // initial matching: greedy on zero reduced cost (v implicit 0)
    for (int64_t r = 0; r < n; ++r) {
        for (int64_t e = ptr[r]; e < ptr[r + 1]; ++e) {
            int64_t j = cols[e];
            if (ip[j] < 0 && std::abs(c[e] - dual_u[j]) < tol) {
                p[r] = j;
                ip[j] = r;
                midx[r] = e;
                break;
            }
        }
    }

    std::vector<double> dist(n);
    std::vector<int64_t> pred_row(n), pred_edge(n);
    std::vector<uint8_t> done(n);
    std::vector<int64_t> touched;
    using QE = std::pair<double, int64_t>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;

    for (int64_t r0 = 0; r0 < n; ++r0) {
        if (p[r0] >= 0) continue;
        // Dijkstra over alternating paths from the free row r0.  The
        // implicit row dual of a matched row i is c(i, p(i)) - u(p(i));
        // the root's is 0, so edge (r0, j) relaxes to c - u directly.
        touched.clear();
        while (!pq.empty()) pq.pop();
        double lsap = inf;
        int64_t sink = -1;
        auto relax = [&](int64_t i, double base, double vi) {
            for (int64_t e = ptr[i]; e < ptr[i + 1]; ++e) {
                int64_t j = cols[e];
                if (done[j]) continue;
                double w = c[e];
                if (w == inf) continue;
                double nd = base + (w - dual_u[j]) - vi;
                if (nd < dist[j]) {
                    dist[j] = nd;
                    pred_row[j] = i;
                    pred_edge[j] = e;
                    pq.emplace(nd, j);
                }
            }
        };
        std::vector<int64_t>& tl = touched;
        for (int64_t j = 0; j < n; ++j) {
            dist[j] = inf;
            done[j] = 0;
        }
        relax(r0, 0.0, 0.0);
        while (!pq.empty()) {
            auto [dj, j] = pq.top();
            pq.pop();
            if (done[j] || dj > dist[j]) continue;
            if (dj >= lsap) break;
            done[j] = 1;
            tl.push_back(j);
            if (ip[j] < 0) {
                lsap = dj;
                sink = j;
                break;
            }
            int64_t i = ip[j];
            double vi = c[midx[i]] - dual_u[p[i]];
            relax(i, dj, vi);
        }
        if (sink < 0) return -1;       // structurally singular
        // dual update on finalized columns
        for (int64_t j : tl)
            if (j != sink) dual_u[j] += dist[j] - lsap;
        // augment along the predecessor chain
        int64_t j = sink;
        while (true) {
            int64_t i = pred_row[j];
            int64_t e = pred_edge[j];
            int64_t jprev = p[i];      // -1 when i == r0
            p[i] = j;
            ip[j] = i;
            midx[i] = e;
            if (i == r0) break;
            j = jprev;
        }
    }
    return 0;
}
