// Native ingest kernel: dense relabeling of a labeled voxel stack.
//
// TPU-native equivalent of the host-side densification step (SURVEY.md §7.1):
// original label ids -> contiguous segments 0..N-1, background pinned to
// segment 0. The pure-numpy path (`np.unique(..., return_inverse=True)`) is a
// full O(V log V) sort over the stack (seconds at 512^3); this is a two-pass
// O(V) table/hash scheme, OpenMP-parallel, memory-bound.
//
// Exposed C ABI (ctypes):
//   int64_t ta_relabel(const void* in, int64_t n, int dtype_code,
//                      int64_t background, int has_background,
//                      int32_t* dense_out, int64_t* ids_out, int64_t max_ids,
//                      int64_t* bg_segment_out);
// Returns the number of distinct labels N (ids_out[0..N-1] ascending except
// that the background label, when present, is swapped to position 0), or
// -N if N > max_ids (caller re-allocates and retries). dense_out[i] is the
// segment of voxel i. *bg_segment_out = 0 if background present else -1.
//
// dtype codes: 0=u8 1=u16 2=u32 3=i32 4=i64 5=u64

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------- small-domain path: direct presence table (u8/u16) ----------
template <typename T, typename OutT>
int64_t relabel_direct(const T* in, int64_t n, int64_t background,
                       bool has_background, OutT* dense, int64_t* ids,
                       int64_t max_ids, int64_t* bg_segment_out) {
  constexpr int64_t DOMAIN = int64_t(1) << (8 * sizeof(T));
  std::vector<uint8_t> present(DOMAIN, 0);

#pragma omp parallel
  {
    std::vector<uint8_t> local(DOMAIN, 0);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) local[in[i]] = 1;
#pragma omp critical
    for (int64_t v = 0; v < DOMAIN; ++v)
      if (local[v]) present[v] = 1;
  }

  // ranks: ascending label order, background swapped to 0 afterwards
  std::vector<int32_t> rank(DOMAIN, -1);
  int64_t n_ids = 0;
  for (int64_t v = 0; v < DOMAIN; ++v)
    if (present[v]) ++n_ids;
  if (n_ids > max_ids) return -n_ids;
  {
    int32_t r = 0;
    for (int64_t v = 0; v < DOMAIN; ++v)
      if (present[v]) {
        rank[v] = r;
        ids[r] = v;
        ++r;
      }
  }

  int64_t bg_segment = -1;
  if (has_background && background >= 0 && background < DOMAIN &&
      present[background]) {
    int32_t bg_rank = rank[background];
    if (bg_rank != 0) {
      // swap segment bg_rank <-> 0 in both table and rank map
      std::swap(ids[0], ids[bg_rank]);
      rank[ids[bg_rank]] = bg_rank;
      rank[background] = 0;
    }
    bg_segment = 0;
  }
  *bg_segment_out = bg_segment;

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dense[i] = OutT(rank[in[i]]);
  return n_ids;
}

// ---------- wide-domain path: open-addressing hash ----------
struct Hash {
  // power-of-two open addressing; EMPTY = INT64_MIN sentinel
  static constexpr int64_t EMPTY = INT64_MIN;
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit Hash(int64_t capacity) {
    uint64_t size = 64;
    while (size < uint64_t(capacity) * 2) size <<= 1;
    keys.assign(size, EMPTY);
    vals.assign(size, -1);
    mask = size - 1;
  }
  static uint64_t mix(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
  }
  // insert key if absent; returns slot index
  uint64_t insert(int64_t k) {
    uint64_t h = mix(uint64_t(k)) & mask;
    while (true) {
      if (keys[h] == k) return h;
      if (keys[h] == EMPTY) {
        keys[h] = k;
        return h;
      }
      h = (h + 1) & mask;
    }
  }
  uint64_t find(int64_t k) const {
    uint64_t h = mix(uint64_t(k)) & mask;
    while (keys[h] != k) h = (h + 1) & mask;
    return h;
  }
};

template <typename T, typename OutT>
int64_t relabel_hash(const T* in, int64_t n, int64_t background,
                     bool has_background, OutT* dense, int64_t* ids,
                     int64_t max_ids, int64_t* bg_segment_out) {
  int nthreads = 1;
#ifdef _OPENMP
  nthreads = omp_get_max_threads();
#endif
  // per-thread unique collection (hash sized for typical cell counts, grows
  // by rebuild on overflow — labels are < ~1e6 distinct in practice)
  std::vector<std::vector<int64_t>> locals(nthreads);

#pragma omp parallel num_threads(nthreads)
  {
    int tid = 0;
#ifdef _OPENMP
    tid = omp_get_thread_num();
#endif
    Hash h(1 << 12);
    std::vector<int64_t>& uniq = locals[tid];
    int64_t prev = INT64_MIN;  // labeled images are runs; cheap dedup
    bool have_prev = false;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      int64_t k = int64_t(in[i]);
      if (have_prev && k == prev) continue;
      prev = k;
      have_prev = true;
      uint64_t slot = h.insert(k);
      if (h.vals[slot] < 0) {
        h.vals[slot] = 1;
        uniq.push_back(k);
        if (uniq.size() * 2 > h.keys.size()) {
          Hash bigger(int64_t(h.keys.size()));  // capacity*2 inside ctor
          for (int64_t u : uniq) bigger.vals[bigger.insert(u)] = 1;
          h = std::move(bigger);
        }
      }
    }
  }

  // merge + sort unique labels
  std::vector<int64_t> all;
  for (auto& v : locals) all.insert(all.end(), v.begin(), v.end());
  std::sort(all.begin(), all.end());
  all.erase(std::unique(all.begin(), all.end()), all.end());
  int64_t n_ids = int64_t(all.size());
  if (n_ids > max_ids) return -n_ids;

  // global rank hash (background swapped to segment 0)
  int64_t bg_segment = -1;
  if (has_background) {
    auto it = std::lower_bound(all.begin(), all.end(), background);
    if (it != all.end() && *it == background) {
      // SWAP (not rotate): must match LabeledStack.from_array's numpy-path
      // convention exactly so both paths produce identical segment ids
      std::iter_swap(all.begin(), it);
      bg_segment = 0;
    }
  }
  *bg_segment_out = bg_segment;
  std::memcpy(ids, all.data(), size_t(n_ids) * sizeof(int64_t));

  Hash rank(n_ids);
  for (int64_t r = 0; r < n_ids; ++r) rank.vals[rank.insert(all[r])] = int32_t(r);

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    dense[i] = OutT(rank.vals[rank.find(int64_t(in[i]))]);
  return n_ids;
}

}  // namespace

template <typename OutT>
int64_t relabel_any(const void* in, int64_t n, int dtype_code,
                    int64_t background, int has_background, OutT* dense_out,
                    int64_t* ids_out, int64_t max_ids,
                    int64_t* bg_segment_out) {
  switch (dtype_code) {
    case 0:
      return relabel_direct(static_cast<const uint8_t*>(in), n, background,
                            has_background, dense_out, ids_out, max_ids,
                            bg_segment_out);
    case 1:
      return relabel_direct(static_cast<const uint16_t*>(in), n, background,
                            has_background, dense_out, ids_out, max_ids,
                            bg_segment_out);
    case 2:
      return relabel_hash(static_cast<const uint32_t*>(in), n, background,
                          has_background, dense_out, ids_out, max_ids,
                          bg_segment_out);
    case 3:
      return relabel_hash(static_cast<const int32_t*>(in), n, background,
                          has_background, dense_out, ids_out, max_ids,
                          bg_segment_out);
    case 4:
      return relabel_hash(static_cast<const int64_t*>(in), n, background,
                          has_background, dense_out, ids_out, max_ids,
                          bg_segment_out);
    case 5:
      return relabel_hash(static_cast<const uint64_t*>(in), n, background,
                          has_background, dense_out, ids_out, max_ids,
                          bg_segment_out);
    default:
      return INT64_MIN;  // unsupported dtype
  }
}

extern "C" {

int64_t ta_relabel(const void* in, int64_t n, int dtype_code,
                   int64_t background, int has_background, int32_t* dense_out,
                   int64_t* ids_out, int64_t max_ids,
                   int64_t* bg_segment_out) {
  return relabel_any(in, n, dtype_code, background, has_background, dense_out,
                     ids_out, max_ids, bg_segment_out);
}

// uint16 dense output — valid only when the label count fits (caller retries
// via ta_relabel if the returned count exceeds 0xFFFF).
int64_t ta_relabel_u16(const void* in, int64_t n, int dtype_code,
                       int64_t background, int has_background,
                       uint16_t* dense_out, int64_t* ids_out, int64_t max_ids,
                       int64_t* bg_segment_out) {
  if (max_ids > 0xFFFF) max_ids = 0xFFFF;
  return relabel_any(in, n, dtype_code, background, has_background, dense_out,
                     ids_out, max_ids, bg_segment_out);
}

// Version tag so the Python side can invalidate stale cached builds.
int64_t ta_native_abi_version() { return 2; }

}  // extern "C"
