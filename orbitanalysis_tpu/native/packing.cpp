// Native host-side ragged packing for the snapshot ingestion path.
//
// The loader returns concatenated per-region blocks (the reference's
// region_offsets convention, /root/reference/orbitanalysis/
// track_orbits.py:52-54); the device engine wants a padded
// [n_rows, capacity] layout.  At 1e8-particle scale this scatter is the
// host-side bottleneck (BASELINE.json configs[4]); NumPy's fancy-index
// scatter is single-threaded, so this OpenMP version parallelizes over
// blocks.  Loaded via ctypes (no pybind11 in the image); the Python
// fallback in utils/padding.py is semantically identical.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC packing.cpp -o _packing.so

#include <cstdint>
#include <cstring>
#include <vector>

#include <omp.h>

extern "C" {

// Pack ragged blocks into out[n_rows * capacity * elem] (pre-filled by
// the caller).  values: [total, elem] row-major; offsets[i] = start of
// block i (ascending); block i lands at row rows[i], columns 0..len-1.
// elem_bytes = bytes per element*elem (the innermost copy unit).
void pack_ragged_bytes(
    const uint8_t* values,
    const int64_t* offsets,   // n_blocks entries
    int64_t n_blocks,
    int64_t total,            // total rows in `values`
    const int64_t* rows,      // n_blocks target rows
    uint8_t* out,
    int64_t capacity,
    int64_t elem_bytes) {
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int64_t start = offsets[b];
    const int64_t end = (b + 1 < n_blocks) ? offsets[b + 1] : total;
    const int64_t len = end - start;
    if (len <= 0) continue;
    std::memcpy(out + (rows[b] * capacity) * elem_bytes,
                values + start * elem_bytes,
                static_cast<size_t>(len) * elem_bytes);
  }
}

// Fill out[n] with the 4-byte pattern `fill` (sentinel init), parallel.
void fill_i32(int32_t* out, int64_t n, int32_t fill) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = fill;
}

// Stable parallel counting sort of grid-cell keys — the O(N log N)
// single-threaded np.argsort in the region extractor's snapshot index
// (engine/regions.py) becomes O(N) multi-threaded.  keys[i] in
// [0, n_cells); outputs starts[n_cells+1] (CSR cell boundaries) and
// order[n] (particle indices grouped by cell, original order within a
// cell — matching np.argsort(kind="stable")).
void grid_count_sort(const int64_t* keys, int64_t n, int64_t n_cells,
                     int64_t* starts, int64_t* order) {
  // team size pinned on both regions (required for stability: the two
  // static-schedule loops must see identical per-thread index ranges,
  // and the scan below must visit exactly the teams that counted);
  // capped so per-thread histograms stay bounded on many-core hosts
  int nt = omp_get_max_threads();
  if (nt > 32) nt = 32;
  // per-thread histograms are n_cells * 8 bytes; a very fine grid
  // (n_cells >> n, user-supplied cell_size) would otherwise allocate
  // gigabytes of transient memory — bound the team by a byte budget
  const int64_t mem_nt = (512ll << 20) / (n_cells * 8 + 1);
  if (nt > mem_nt) nt = static_cast<int>(mem_nt);
  if (nt < 1) nt = 1;
  std::vector<std::vector<int64_t>> hist(nt);
  for (int t = 0; t < nt; ++t) hist[t].assign(n_cells, 0);
#pragma omp parallel num_threads(nt)
  {
    const int t = omp_get_thread_num();
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) ++hist[t][keys[i]];
  }
  // exclusive scan: cell-major, thread-minor — with schedule(static)
  // both passes see identical contiguous index ranges per thread, so
  // per-cell output runs are ordered by (thread, index) = stable
  int64_t run = 0;
  for (int64_t c = 0; c < n_cells; ++c) {
    starts[c] = run;
    for (int t = 0; t < nt; ++t) {
      const int64_t h = hist[t][c];
      hist[t][c] = run;
      run += h;
    }
  }
  starts[n_cells] = run;
#pragma omp parallel num_threads(nt)
  {
    const int t = omp_get_thread_num();
    auto& off = hist[t];
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) order[off[keys[i]]++] = i;
  }
}

}  // extern "C"
