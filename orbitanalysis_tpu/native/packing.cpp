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

#include <algorithm>
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

// Stable-layout alignment for the aligned tracking engine (see
// engine/packing.py:StableLayout).  Per halo row (parallel over rows):
// match the front-packed load-order ids against the persistent layout
// via an open-addressing hash of the previous layout row (survivors
// keep their position), assign entrants to free positions in ascending
// position order, and scatter ids/pos/vel/mass straight into the
// stable positions — replacing the NumPy path's per-snapshot
// argsort + searchsorted + four fancy-index scatters (~1 s at 2M rows,
// single-threaded) with an O(P)-per-row multithreaded pass.
//
// In/out:
//   layout   [H, P] i32, in/out — persistent id-at-position table
//   ids      [H, P] i32 load-order front-packed (invalid-padded tail)
//   pos, vel [H, P, 3] f32 load-order; mass [H, P] f32 or null
//   ids_o, pos_o, vel_o, mass_o, slot_o — outputs in stable positions;
//   slot_o[h, j] = load index occupying position j, holes numbered
//   n_valid.. in position order (a permutation of [0, P) per row in
//   bits 0-23), with the FRESH flag in bit 27 at positions whose
//   tenant changed (an entrant, incl. reuse of a departure's hole) —
//   the carry-native detection kernel suppresses stale prev-carry
//   state from this flag alone, with no device-side ID compare.
// Returns the number of rows that overflowed (entrants > free
// positions — cannot happen while membership <= capacity).
//
// The numeric suffix versions the ABI (a stale prebuilt _packing.so is
// gitignored and survives source updates — it must fail the symbol
// lookup and rebuild rather than silently run old semantics): "2"
// added the FRESH bit to the slot contract; "3" added the `soa` flag;
// the "_i64" variant (wide particle IDs, e.g. Gadget uint64 remapped
// to int64) was added alongside without changing the i32 ABI.
//
// soa != 0: pos_o/vel_o are [3, H, P] coordinate planes (the layout
// the device engine consumes) instead of [H, P, 3] — the scatter
// writes the staged SoA form directly, so the caller needs no
// transpose pass and the host->device transfer reads contiguous
// memory.  Inputs stay [H, P, 3] (the loader's layout) either way.
// Output pointers are caller-provided and may be persistent buffers:
// rewriting them in place avoids the per-snapshot mmap/page-fault
// churn of fresh allocations (measured 5-10x swings on the staging
// loop).

}  // extern "C"

namespace {

// Fibonacci-style multiplicative hash, specialized per id width.
inline uint32_t id_hash(int32_t k) {
  return static_cast<uint32_t>(k) * 2654435761u;
}
inline uint32_t id_hash(int64_t k) {
  uint64_t x = static_cast<uint64_t>(k) * 0x9E3779B97F4A7C15ull;
  return static_cast<uint32_t>(x >> 32);
}

template <typename IdT>
int64_t stable_align_impl(
    IdT* layout,
    const IdT* ids,
    const float* pos,
    const float* vel,
    const float* mass,
    int64_t H,
    int64_t P,
    IdT invalid,
    IdT* ids_o,
    float* pos_o,
    float* vel_o,
    float* mass_o,
    int32_t* slot_o,
    int32_t soa) {
  // hash table size: first power of two >= 2P
  int64_t tsz = 1;
  while (tsz < 2 * P) tsz <<= 1;
  const uint32_t tmask = static_cast<uint32_t>(tsz - 1);
  int64_t overflowed = 0;
#pragma omp parallel reduction(+ : overflowed)
  {
    std::vector<IdT> hkey(tsz);
    std::vector<int32_t> hpos(tsz);
    std::vector<int32_t> dest(P);
    std::vector<uint8_t> claimed(P);
#pragma omp for schedule(dynamic, 1)
    for (int64_t h = 0; h < H; ++h) {
      const IdT* lay = layout + h * P;
      const IdT* id = ids + h * P;
      // build id -> position over the previous layout row
      std::fill(hkey.begin(), hkey.end(), invalid);
      for (int64_t j = 0; j < P; ++j) {
        const IdT k = lay[j];
        if (k == invalid) continue;
        uint32_t s = id_hash(k) & tmask;
        while (hkey[s] != invalid) s = (s + 1) & tmask;
        hkey[s] = k;
        hpos[s] = static_cast<int32_t>(j);
      }
      // survivors keep their position
      std::fill(claimed.begin(), claimed.end(), 0);
      int64_t n_valid = 0;
      for (int64_t i = 0; i < P; ++i) {
        const IdT k = id[i];
        if (k == invalid) {
          dest[i] = -1;
          continue;  // front-packed: could break, but stay tolerant
        }
        ++n_valid;
        uint32_t s = id_hash(k) & tmask;
        int32_t d = -1;
        while (hkey[s] != invalid) {
          if (hkey[s] == k) {
            d = hpos[s];
            break;
          }
          s = (s + 1) & tmask;
        }
        dest[i] = d;
        if (d >= 0) claimed[d] = 1;
      }
      // entrants fill free positions in ascending position order;
      // bit 30 marks the dest as an entrant's (-> FRESH in slot_o)
      int64_t free_j = 0;
      bool overflow = false;
      for (int64_t i = 0; i < P; ++i) {
        const IdT k = id[i];
        if (k == invalid || dest[i] >= 0) continue;
        while (free_j < P && claimed[free_j]) ++free_j;
        if (free_j == P) {
          overflow = true;
          break;
        }
        dest[i] = static_cast<int32_t>(free_j) | (1 << 30);
        claimed[free_j] = 1;
      }
      if (overflow) {
        ++overflowed;
        continue;  // row outputs undefined; caller raises
      }
      // scatter into stable positions; holes zero/invalid-filled
      IdT* lay_o = layout + h * P;
      IdT* io = ids_o + h * P;
      int32_t* so = slot_o + h * P;
      for (int64_t j = 0; j < P; ++j) {
        io[j] = invalid;
        so[j] = -1;
      }
      if (mass) std::memset(mass_o + h * P, 0, sizeof(float) * P);
      if (soa) {
        float* px = pos_o + h * P;
        float* py = pos_o + (H + h) * P;
        float* pz = pos_o + (2 * H + h) * P;
        float* vx = vel_o + h * P;
        float* vy = vel_o + (H + h) * P;
        float* vz = vel_o + (2 * H + h) * P;
        std::memset(px, 0, sizeof(float) * P);
        std::memset(py, 0, sizeof(float) * P);
        std::memset(pz, 0, sizeof(float) * P);
        std::memset(vx, 0, sizeof(float) * P);
        std::memset(vy, 0, sizeof(float) * P);
        std::memset(vz, 0, sizeof(float) * P);
        for (int64_t i = 0; i < P; ++i) {
          int32_t d = dest[i];
          if (d < 0) continue;
          const int32_t fresh = (d >> 30) & 1;
          d &= ~(1 << 30);
          io[d] = id[i];
          so[d] = static_cast<int32_t>(i) | (fresh << 27);
          px[d] = pos[(h * P + i) * 3];
          py[d] = pos[(h * P + i) * 3 + 1];
          pz[d] = pos[(h * P + i) * 3 + 2];
          vx[d] = vel[(h * P + i) * 3];
          vy[d] = vel[(h * P + i) * 3 + 1];
          vz[d] = vel[(h * P + i) * 3 + 2];
          if (mass) mass_o[h * P + d] = mass[h * P + i];
        }
      } else {
        float* po = pos_o + h * P * 3;
        float* vo = vel_o + h * P * 3;
        std::memset(po, 0, sizeof(float) * P * 3);
        std::memset(vo, 0, sizeof(float) * P * 3);
        for (int64_t i = 0; i < P; ++i) {
          int32_t d = dest[i];
          if (d < 0) continue;
          const int32_t fresh = (d >> 30) & 1;
          d &= ~(1 << 30);
          io[d] = id[i];
          so[d] = static_cast<int32_t>(i) | (fresh << 27);
          po[d * 3] = pos[(h * P + i) * 3];
          po[d * 3 + 1] = pos[(h * P + i) * 3 + 1];
          po[d * 3 + 2] = pos[(h * P + i) * 3 + 2];
          vo[d * 3] = vel[(h * P + i) * 3];
          vo[d * 3 + 1] = vel[(h * P + i) * 3 + 1];
          vo[d * 3 + 2] = vel[(h * P + i) * 3 + 2];
          if (mass) mass_o[h * P + d] = mass[h * P + i];
        }
      }
      // holes take the unused slot numbers in position order
      int32_t hole_slot = static_cast<int32_t>(n_valid);
      for (int64_t j = 0; j < P; ++j)
        if (so[j] < 0) so[j] = hole_slot++;
      // the new layout row IS the stable-position id row
      std::memcpy(lay_o, io, sizeof(IdT) * P);
    }
  }
  return overflowed;
}

}  // namespace

extern "C" {

int64_t stable_align3(
    int32_t* layout, const int32_t* ids, const float* pos,
    const float* vel, const float* mass, int64_t H, int64_t P,
    int32_t invalid, int32_t* ids_o, float* pos_o, float* vel_o,
    float* mass_o, int32_t* slot_o, int32_t soa) {
  return stable_align_impl<int32_t>(layout, ids, pos, vel, mass, H, P,
                                    invalid, ids_o, pos_o, vel_o, mass_o,
                                    slot_o, soa);
}

// Wide-ID variant: int64 layout/ids (e.g. Gadget uint64 IDs remapped to
// int64 by the loader); the f32 payload and the i32 slot contract are
// identical.  The device engine never sees these IDs — the aligned
// layout is positional, so the device streams a 32-bit position
// surrogate and the tracker maps event positions back through the
// staged ID table (engine/tracker.py).
int64_t stable_align3_i64(
    int64_t* layout, const int64_t* ids, const float* pos,
    const float* vel, const float* mass, int64_t H, int64_t P,
    int64_t invalid, int64_t* ids_o, float* pos_o, float* vel_o,
    float* mass_o, int32_t* slot_o, int32_t soa) {
  return stable_align_impl<int64_t>(layout, ids, pos, vel, mass, H, P,
                                    invalid, ids_o, pos_o, vel_o, mass_o,
                                    slot_o, soa);
}

}  // extern "C"
