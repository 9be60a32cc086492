// Fast CSR sparsity-pattern construction from per-cell DOF maps.
//
// Native replacement for the numpy np.unique path in
// lsafw_tpu/ops/sparse.py::build_sparsity, which sorts the full
// (num_cells * a * b) COO key array (tens of seconds at 1M DOFs).
// Here entries are bucketed by row with a counting sort (two linear
// passes), then each row's small column list (~element valence) is
// sorted and deduplicated independently — O(E + n * w log w), row loop
// OpenMP-parallel.  This plays the role the reference delegates to
// dolfinx's C++ sparsity builder (SURVEY.md section 2.2).
//
// Build: see native/Makefile (produces libsparsity.so, loaded via
// ctypes from lsafw_tpu/ops/native.py with a numpy fallback).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Phase 1+2 in one call.
//
// cell_rows: (num_cells, a) int32 row DOFs per cell
// cell_cols: (num_cells, b) int32 col DOFs per cell
// Outputs (caller-allocated):
//   indptr:  (n_rows + 1) int64
//   indices: capacity num_cells*a*b int32 — first nnz entries valid
//   slots:   (num_cells*a*b) int32 — COO entry -> nnz slot, in the
//            canonical (cell, i, j) flattening order
// Returns nnz, or -1 on inconsistency.
int64_t lsafw_build_pattern(const int32_t* cell_rows, const int32_t* cell_cols,
                            int64_t num_cells, int64_t a, int64_t b,
                            int64_t n_rows, int64_t* indptr, int32_t* indices,
                            int32_t* slots) {
  const int64_t n_entries = num_cells * a * b;

  // --- pass 1: count entries per row -------------------------------------
  std::vector<int64_t> count(n_rows + 1, 0);
  for (int64_t c = 0; c < num_cells; ++c) {
    const int32_t* rr = cell_rows + c * a;
    for (int64_t i = 0; i < a; ++i) {
      const int32_t r = rr[i];
      if (r < 0 || r >= n_rows) return -1;
      count[r + 1] += b;
    }
  }
  std::vector<int64_t> offs(n_rows + 1, 0);
  for (int64_t r = 0; r < n_rows; ++r) offs[r + 1] = offs[r] + count[r + 1];

  // --- pass 2: scatter (col, entry_id) into row buckets -------------------
  std::vector<int32_t> bcol(n_entries);
  std::vector<int64_t> beid(n_entries);
  {
    std::vector<int64_t> cursor(offs.begin(), offs.end() - 1);
    for (int64_t c = 0; c < num_cells; ++c) {
      const int32_t* rr = cell_rows + c * a;
      const int32_t* cc = cell_cols + c * b;
      for (int64_t i = 0; i < a; ++i) {
        const int64_t base = (c * a + i) * b;
        int64_t& cur = cursor[rr[i]];
        for (int64_t j = 0; j < b; ++j) {
          bcol[cur] = cc[j];
          beid[cur] = base + j;
          ++cur;
        }
      }
    }
  }

  // --- pass 3a: per-row sort + count unique (parallel) --------------------
  std::vector<int64_t> row_nnz(n_rows, 0);
#pragma omp parallel for schedule(dynamic, 512)
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t lo = offs[r], hi = offs[r + 1];
    if (lo == hi) continue;
    // sort the bucket's (col, eid) pairs by col; eid order within equal
    // cols is irrelevant (all map to the same slot)
    std::vector<int64_t> perm(hi - lo);
    for (int64_t k = 0; k < hi - lo; ++k) perm[k] = lo + k;
    std::sort(perm.begin(), perm.end(),
              [&](int64_t x, int64_t y) { return bcol[x] < bcol[y]; });
    // apply permutation in place via temporaries (buckets are tiny)
    std::vector<int32_t> tc(hi - lo);
    std::vector<int64_t> te(hi - lo);
    for (int64_t k = 0; k < hi - lo; ++k) {
      tc[k] = bcol[perm[k]];
      te[k] = beid[perm[k]];
    }
    std::memcpy(&bcol[lo], tc.data(), tc.size() * sizeof(int32_t));
    std::memcpy(&beid[lo], te.data(), te.size() * sizeof(int64_t));
    int64_t u = 1;
    for (int64_t k = lo + 1; k < hi; ++k)
      if (bcol[k] != bcol[k - 1]) ++u;
    row_nnz[r] = u;
  }

  // --- prefix sum of unique counts -> indptr ------------------------------
  indptr[0] = 0;
  for (int64_t r = 0; r < n_rows; ++r) indptr[r + 1] = indptr[r] + row_nnz[r];
  const int64_t nnz = indptr[n_rows];

  // --- pass 3b: emit indices + slots (parallel) ---------------------------
#pragma omp parallel for schedule(dynamic, 512)
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t lo = offs[r], hi = offs[r + 1];
    int64_t slot = indptr[r] - 1;
    int32_t prev = -1;
    bool first = true;
    for (int64_t k = lo; k < hi; ++k) {
      if (first || bcol[k] != prev) {
        ++slot;
        indices[slot] = bcol[k];
        prev = bcol[k];
        first = false;
      }
      slots[beid[k]] = static_cast<int32_t>(slot);
    }
  }
  return nnz;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering.
//
// Native replacement for scipy.sparse.csgraph.reverse_cuthill_mckee,
// which costs 30-80 s at 520k DOFs (the band planner's host
// bottleneck; ROADMAP round-3 item 3).  Standard George-Liu
// pseudo-peripheral start per connected component + Cuthill-McKee BFS
// with degree-sorted neighbor insertion, reversed at the end.
// The input pattern must be structurally symmetric.
// ---------------------------------------------------------------------------

static int64_t bfs_levels(const int64_t* indptr, const int32_t* indices,
                          int32_t start, std::vector<int32_t>& level,
                          std::vector<int32_t>& queue, int32_t mark) {
  // BFS from start over nodes with level[v] == -mark sentinel semantics:
  // level[v] >= 0 means visited this sweep.  Returns eccentricity; the
  // queue holds the visit order.
  queue.clear();
  queue.push_back(start);
  level[start] = 0;
  int64_t ecc = 0;
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    const int32_t u = queue[qi];
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      const int32_t v = indices[e];
      if (level[v] == -1) {
        level[v] = level[u] + 1;
        if (level[v] > ecc) ecc = level[v];
        queue.push_back(v);
      }
    }
  }
  (void)mark;
  return ecc;
}

extern "C" int64_t lsafw_rcm(const int64_t* indptr, const int32_t* indices,
                             int64_t n, int32_t* perm_out) {
  std::vector<int32_t> degree(n);
  for (int64_t i = 0; i < n; ++i)
    degree[i] = static_cast<int32_t>(indptr[i + 1] - indptr[i]);

  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> level(n), queue, tmp;
  std::vector<int32_t> order;
  order.reserve(n);

  for (int64_t seed = 0; seed < n; ++seed) {
    if (visited[seed]) continue;
    // pseudo-peripheral node (George-Liu): iterate BFS from a
    // min-degree node of the deepest level until eccentricity stalls
    int32_t start = static_cast<int32_t>(seed);
    {
      std::fill(level.begin(), level.end(), -1);
      // restrict sweeps to this component: mark others visited via level
      for (int64_t v = 0; v < n; ++v)
        if (visited[v]) level[v] = -2;
      int64_t ecc = bfs_levels(indptr, indices, start, level, queue, 0);
      for (int iter = 0; iter < 8; ++iter) {
        // min-degree node in the last level
        int32_t best = -1;
        for (int64_t qi = (int64_t)queue.size() - 1; qi >= 0; --qi) {
          const int32_t v = queue[qi];
          if (level[v] != ecc) break;
          if (best < 0 || degree[v] < degree[best]) best = v;
        }
        if (best < 0) break;
        for (int64_t v = 0; v < n; ++v)
          if (level[v] >= 0) level[v] = -1;
        int64_t ecc2 = bfs_levels(indptr, indices, best, level, queue, 0);
        if (ecc2 <= ecc) { start = best; break; }
        ecc = ecc2;
        start = best;
      }
    }
    // Cuthill-McKee from start: append unvisited neighbors by degree
    order.push_back(start);
    visited[start] = 1;
    for (size_t oi = order.size() - 1; oi < order.size(); ++oi) {
      const int32_t u = order[oi];
      tmp.clear();
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        const int32_t v = indices[e];
        if (!visited[v]) { visited[v] = 1; tmp.push_back(v); }
      }
      std::sort(tmp.begin(), tmp.end(), [&](int32_t a2, int32_t b2) {
        return degree[a2] < degree[b2];
      });
      for (int32_t v : tmp) order.push_back(v);
    }
  }
  if ((int64_t)order.size() != n) return -1;
  for (int64_t i = 0; i < n; ++i)
    perm_out[i] = order[n - 1 - i];  // reverse
  return 0;
}
