// Native problem-compiler kernels for montecarlosolvers_tpu.
//
// The reference implements its sparse->dense neighbor-table compile in
// Cython with an O(N * nnz) DOK scan (tools.pyx:28-96). This C++ version is
// O(nnz) with per-row fill counters, plus a greedy graph coloring used to
// derive the parallel-sweep independent sets (the reference has no coloring
// — its sweeps are sequential). Exposed via ctypes (see __init__.py).
//
// Build: make -C montecarlosolvers_tpu/native   (or automatic on import)

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// Build the (nspins, maxnb, 2) neighbor table. Returns 0 on success,
// -(spin+1) when some spin exceeds maxnb slots.
// out is float64, length nspins*maxnb*2, zero-initialized by caller.
int64_t mcs_build_neighbor_table(int64_t nspins, int64_t nnz,
                                 const int64_t* rows, const int64_t* cols,
                                 const double* vals, int64_t maxnb,
                                 double* out) {
  std::vector<int64_t> fill(nspins, 0);
  auto push = [&](int64_t i, int64_t j, double v) -> bool {
    int64_t k = fill[i];
    if (k >= maxnb) return false;
    out[(i * maxnb + k) * 2 + 0] = static_cast<double>(j);
    out[(i * maxnb + k) * 2 + 1] = v;
    fill[i] = k + 1;
    return true;
  };
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t a = rows[e], b = cols[e];
    double v = vals[e];
    if (a == b) {
      if (!push(a, a, v)) return -(a + 1);
    } else {
      if (!push(a, b, v)) return -(a + 1);
      if (!push(b, a, v)) return -(b + 1);
    }
  }
  return 0;
}

// Greedy graph coloring over a padded neighbor table.
// nbr_idx: (nspins, maxnb) int32; slots equal to the own index or with
// zero coupling (nbr_val, may be null) are inactive. colors: out, int32.
// Returns the number of colors.
int64_t mcs_greedy_color(int64_t nspins, int64_t maxnb,
                         const int32_t* nbr_idx, const double* nbr_val,
                         int32_t* colors) {
  std::vector<int32_t> used;  // color -> last spin that marked it
  used.assign(static_cast<size_t>(maxnb) + 2, -1);
  for (int64_t i = 0; i < nspins; ++i) colors[i] = -1;
  int64_t ncolors = 0;
  for (int64_t i = 0; i < nspins; ++i) {
    for (int64_t m = 0; m < maxnb; ++m) {
      int32_t j = nbr_idx[i * maxnb + m];
      if (j == i) continue;
      if (nbr_val != nullptr && nbr_val[i * maxnb + m] == 0.0) continue;
      int32_t c = colors[j];
      if (c >= 0) used[c] = static_cast<int32_t>(i);
    }
    int32_t c = 0;
    while (used[c] == static_cast<int32_t>(i)) ++c;
    colors[i] = c;
    if (c + 1 > ncolors) ncolors = c + 1;
  }
  return ncolors;
}

// Fast triplet-file energy oracle: E = sum_e J_e s_i s_j  (+ fields on the
// diagonal), matching tools.ClassicalIsingEnergy (tools.pyx:99-118) without
// densifying the matrix.
double mcs_triplet_energy(int64_t nnz, const int64_t* rows,
                          const int64_t* cols, const double* vals,
                          const double* spins) {
  double e = 0.0;
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t a = rows[k], b = cols[k];
    e += (a == b) ? vals[k] * spins[a] : vals[k] * spins[a] * spins[b];
  }
  return e;
}

}  // extern "C"
