// Native terrain runtime: residency state machine + async tile file IO.
//
// The reference implements its host runtime in Rust: the TileAtlas
// residency state machine (request counting, FIFO-of-unused-slots LRU,
// best-loaded-ancestor walks; /root/reference/src/terrain_data/tile_atlas.rs:282-504)
// and the async tile file loader (AsyncComputeTaskPool tasks,
// tile_atlas.rs:77-149). This is the TPU build's C++ equivalent, exposed
// through a C ABI consumed via ctypes (bevy_terrain_tpu/native/__init__.py);
// the Python implementation remains as a semantically identical fallback
// and as the cross-check oracle in tests.
//
// Tile keys are the packed int64 of terrain_data/tile_atlas.py::pack_keys:
//   side << 57 | lod << 52 | x << 26 | y        (lod <= 26)
//
// Build: make -C bevy_terrain_tpu/native

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int64_t kLodShift = 52;
constexpr int64_t kXShift = 26;
constexpr int64_t kSideShift = 57;
constexpr int32_t kInvalid = -1;

inline int64_t parent_key(int64_t key) {
  const int64_t side = key >> kSideShift;
  const int64_t lod = (key >> kLodShift) & 0x1F;
  const int64_t x = (key >> kXShift) & 0x3FFFFFF;
  const int64_t y = key & 0x3FFFFFF;
  if (lod == 0) return -1;
  return (side << kSideShift) | ((lod - 1) << kLodShift) | ((x >> 1) << kXShift) |
         (y >> 1);
}

struct TileState {
  int32_t atlas_index = kInvalid;
  int32_t requests = 0;
  int32_t loading_remaining = 0;  // 0 == Loaded
};

struct LoadEntry {
  int64_t key;
  int32_t atlas_index;
  int32_t attachment_index;
};

// Residency state machine (tile_atlas.rs:282-504 semantics).
struct Residency {
  int32_t atlas_size;
  int32_t attachment_count;
  struct UnusedEntry {
    int32_t index;
    uint32_t generation;
    int64_t key;
  };

  std::unordered_map<int64_t, TileState> states;
  // FIFO of unused slots == LRU cache (tile_atlas.rs:506-515). Entries are
  // invalidated lazily via per-slot generation counters (revival removes a
  // slot from the cache, tile_atlas.rs:426-431; re-release re-queues it at
  // the back with a fresh generation).
  std::deque<UnusedEntry> unused;
  std::vector<uint32_t> generation;
  std::unordered_set<int64_t> existing;
  std::deque<LoadEntry> to_load;

  Residency(int32_t size, int32_t attachments)
      : atlas_size(size), attachment_count(attachments), generation(size, 0) {
    for (int32_t i = 0; i < size; ++i) unused.push_back({i, 0, INT64_MIN});
  }

  // pops the least-recently-released slot (tile_atlas.rs:383-389);
  // returns -1 on exhaustion ("Atlas out of indices", tile_atlas.rs:384)
  int32_t allocate() {
    while (!unused.empty()) {
      const UnusedEntry e = unused.front();
      unused.pop_front();
      if (e.generation != generation[e.index]) continue;  // stale entry
      generation[e.index] += 1;  // consumed
      if (e.key != INT64_MIN) states.erase(e.key);
      return e.index;
    }
    return kInvalid;
  }

  // returns atlas_index, or -2 when the tile doesn't exist, or -3 on
  // atlas exhaustion (tile_atlas.rs:418-457)
  int32_t request(int64_t key) {
    if (!existing.count(key)) return -2;
    auto it = states.find(key);
    if (it != states.end()) {
      TileState &s = it->second;
      if (s.requests == 0) generation[s.atlas_index] += 1;  // revive from LRU
      s.requests += 1;
      return s.atlas_index;
    }
    const int32_t index = allocate();
    if (index == kInvalid) return -3;
    TileState s;
    s.atlas_index = index;
    s.requests = 1;
    s.loading_remaining = attachment_count;
    states.emplace(key, s);
    for (int32_t a = 0; a < attachment_count; ++a)
      to_load.push_back({key, index, a});
    return index;
  }

  // returns 0, or -1 for releasing a non-present tile (panic in the
  // reference, tile_atlas.rs:467)
  int32_t release(int64_t key) {
    if (!existing.count(key)) return 0;
    auto it = states.find(key);
    if (it == states.end()) return -1;
    TileState &s = it->second;
    s.requests -= 1;
    if (s.requests == 0)
      unused.push_back({s.atlas_index, generation[s.atlas_index], key});
    return 0;
  }

  // one attachment finished loading; returns -1 on over-load (panic in the
  // reference, tile_atlas.rs:355-357)
  int32_t loaded(int64_t key) {
    auto it = states.find(key);
    if (it == states.end()) return 0;  // tile already evicted
    if (it->second.loading_remaining == 0) return -1;
    it->second.loading_remaining -= 1;
    return 0;
  }

  int32_t get_or_allocate(int64_t key) {
    existing.insert(key);
    auto it = states.find(key);
    if (it != states.end()) return it->second.atlas_index;
    const int32_t index = allocate();
    if (index == kInvalid) return -3;
    TileState s;
    s.atlas_index = index;
    s.requests = 1;
    s.loading_remaining = 0;  // Loaded immediately (tile_atlas.rs:391-416)
    states.emplace(key, s);
    return index;
  }

  // batch best-loaded-ancestor walk (tile_atlas.rs:477-503)
  void best_tiles(const int32_t *side, const int32_t *lod, const int32_t *x,
                  const int32_t *y, int64_t n, int32_t *out_index,
                  int32_t *out_lod) const {
    for (int64_t i = 0; i < n; ++i) {
      int64_t s = side[i], l = lod[i], xx = x[i], yy = y[i];
      out_index[i] = kInvalid;
      out_lod[i] = kInvalid;
      if (l < 0 || xx < 0 || yy < 0 || l > 26) continue;
      while (l >= 0) {
        const int64_t key = (s << kSideShift) | (l << kLodShift) |
                            (xx << kXShift) | yy;
        auto it = states.find(key);
        if (it != states.end() && it->second.loading_remaining == 0) {
          out_index[i] = it->second.atlas_index;
          out_lod[i] = static_cast<int32_t>(l);
          break;
        }
        --l;
        xx >>= 1;
        yy >>= 1;
      }
    }
  }
};

// Async file loader pool (tile_atlas.rs:118-149 equivalent): worker threads
// read whole files into caller-owned buffers; completions are polled.
struct IoPool {
  struct Job {
    int64_t id;
    std::string path;
    uint8_t *buffer;
    int64_t capacity;
  };
  struct Done {
    int64_t id;
    int64_t bytes;  // -1 == error (missing file etc.)
  };

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Job> jobs;
  std::deque<Done> done;
  bool stop = false;

  explicit IoPool(int threads) {
    for (int i = 0; i < threads; ++i)
      workers.emplace_back([this] { this->run(); });
  }

  ~IoPool() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto &w : workers) w.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      int64_t bytes = -1;
      FILE *f = std::fopen(job.path.c_str(), "rb");
      if (f) {
        bytes = static_cast<int64_t>(
            std::fread(job.buffer, 1, static_cast<size_t>(job.capacity), f));
        std::fclose(f);
      }
      {
        std::lock_guard<std::mutex> lock(mu);
        done.push_back({job.id, bytes});
      }
    }
  }

  void submit(int64_t id, const char *path, uint8_t *buffer, int64_t capacity) {
    {
      std::lock_guard<std::mutex> lock(mu);
      jobs.push_back({id, path, buffer, capacity});
    }
    cv.notify_one();
  }

  int64_t poll(int64_t *ids, int64_t *sizes, int64_t cap) {
    std::lock_guard<std::mutex> lock(mu);
    int64_t n = 0;
    while (n < cap && !done.empty()) {
      ids[n] = done.front().id;
      sizes[n] = done.front().bytes;
      done.pop_front();
      ++n;
    }
    return n;
  }
};

}  // namespace
namespace {

// ---------------------------------------------------------------------------
// Per-frame request scan (the reference's TileTree::update CPU hot loop,
// tile_tree.rs:268-333). The vectorized-numpy twin costs ~0.5-1 ms/frame in
// interpreter overhead at 320-2000 slots; this runs the same f64 math in a
// plain loop (~10 us). Cube-sphere math ported from math/coordinate.py
// (C_SQR sigmoid inverse + SIDE_LOCAL_MATRICES, coordinate.rs:110-124).
// ---------------------------------------------------------------------------

constexpr double kCSqr = 0.87 * 0.87;

// cube = SIDE_LOCAL_MATRICES[side] @ [p.x, p.y, 1]
constexpr double kSideMats[6][3][3] = {
    {{0, 0, -1}, {0, -1, 0}, {1, 0, 0}},  {{1, 0, 0}, {0, -1, 0}, {0, 0, 1}},
    {{1, 0, 0}, {0, 0, 1}, {0, 1, 0}},    {{0, 0, 1}, {-1, 0, 0}, {0, 1, 0}},
    {{0, 1, 0}, {-1, 0, 0}, {0, 0, -1}},  {{0, 1, 0}, {0, 0, -1}, {1, 0, 0}},
};

inline int64_t pack_key(int64_t side, int64_t lod, int64_t x, int64_t y) {
  return (side << kSideShift) | (lod << kLodShift) | (x << kXShift) | y;
}

struct ScanParams {
  int32_t kind;        // 0 planar, 1 spherical/ellipsoidal
  double m[12];        // world_from_local (3x4 row-major, f64)
  double inv_m3[9];    // inverse of the 3x3 block (row-major)
  double view[3];
  double approx_height;
  double load_distance;
};

}  // namespace

namespace {

// world position of a slot sample coordinate + approx-height normal offset
// (tile_tree.py::_slot_world_positions). Returns false for NaN (wrapped
// coordinates beyond the per-lod count -> never requested).
inline bool slot_world(const ScanParams &p, int32_t side, double u, double v,
                       double out[3]) {
  double local[3];
  double ln[3];  // local normal
  if (p.kind == 0) {
    local[0] = u - 0.5;
    local[1] = 0.0;
    local[2] = v - 0.5;
    ln[0] = 0.0;
    ln[1] = 1.0;
    ln[2] = 0.0;
  } else {
    // sigmoid_warp_inverse: w = 2uv-1; p = w / sqrt(1 + C - C w^2)
    const double wu = 2.0 * u - 1.0, wv = 2.0 * v - 1.0;
    const double du = 1.0 + kCSqr - kCSqr * wu * wu;
    const double dv = 1.0 + kCSqr - kCSqr * wv * wv;
    if (du <= 0.0 || dv <= 0.0) return false;  // numpy path yields NaN
    const double pu = wu / std::sqrt(du), pv = wv / std::sqrt(dv);
    const double homo[3] = {pu, pv, 1.0};
    double norm2 = 0.0;
    for (int i = 0; i < 3; ++i) {
      local[i] = 0.0;
      for (int j = 0; j < 3; ++j) local[i] += kSideMats[side][i][j] * homo[j];
      norm2 += local[i] * local[i];
    }
    const double inv = 1.0 / std::sqrt(norm2);
    for (int i = 0; i < 3; ++i) {
      local[i] *= inv;
      ln[i] = local[i];
    }
  }
  // world = local @ m3^T + t;  n = normalize(ln @ inv_m3) (row-vector form)
  double n[3] = {0, 0, 0};
  double nn = 0.0;
  for (int j = 0; j < 3; ++j) {
    for (int i = 0; i < 3; ++i) n[j] += ln[i] * p.inv_m3[3 * i + j];
  }
  for (int j = 0; j < 3; ++j) nn += n[j] * n[j];
  nn = 1.0 / std::sqrt(nn);
  for (int j = 0; j < 3; ++j) {
    const double w = p.m[4 * j + 0] * local[0] + p.m[4 * j + 1] * local[1] +
                     p.m[4 * j + 2] * local[2] + p.m[4 * j + 3];
    out[j] = w + p.approx_height * n[j] * nn;
  }
  return true;
}

}  // namespace

extern "C" {

// Scan all (side, lod, i, j) slots: wrap coordinates around the per-lod
// origin, classify requested by closest-point distance, diff against the
// previous state into packed-key release/request lists. Mutates tile_xy
// (S*L*T*T*2 i64) and requested (S*L*T*T u8) in place; returns counts via
// n_released/n_requested. Semantics identical to the numpy scan
// (tile_tree.py::compute_requests); fuzz-tested against it.
void tr_scan_requests(int32_t kind, const double *m, const double *inv_m3,
                      const double *view, double approx_height,
                      double load_distance, int32_t S, int32_t L, int32_t T,
                      const int32_t *origins, const int32_t *view_int,
                      const double *view_frac, int64_t *tile_xy,
                      uint8_t *requested, int64_t *released,
                      int64_t *requested_keys, int32_t *n_released,
                      int32_t *n_requested) {
  ScanParams p;
  p.kind = kind;
  std::memcpy(p.m, m, sizeof(p.m));
  std::memcpy(p.inv_m3, inv_m3, sizeof(p.inv_m3));
  std::memcpy(p.view, view, sizeof(p.view));
  p.approx_height = approx_height;
  p.load_distance = load_distance;
  int32_t nr = 0, nq = 0;
  for (int32_t s = 0; s < S; ++s) {
    for (int32_t l = 0; l < L; ++l) {
      const int64_t sl = (int64_t)s * L + l;
      const int32_t ox = origins[2 * sl], oy = origins[2 * sl + 1];
      const int64_t vix = view_int[2 * sl], viy = view_int[2 * sl + 1];
      const double vfx = view_frac[2 * sl], vfy = view_frac[2 * sl + 1];
      const double inv_count = 1.0 / (double)(int64_t(1) << l);
      const double ld = load_distance * inv_count;
      for (int32_t i = 0; i < T; ++i) {    // x index
        for (int32_t j = 0; j < T; ++j) {  // y index
          const int64_t slot = (sl * T + i) * T + j;
          // wrapping rule: origin + ((ij - origin) mod T)
          const int64_t nx = ox + ((((int64_t)i - ox) % T) + T) % T;
          const int64_t ny = oy + ((((int64_t)j - oy) % T) + T) % T;
          // closest-point offset (tile_tree.rs:199-214)
          const int64_t tox = vix - nx, toy = viy - ny;
          const double offx = tox < 0 ? 0.0 : (tox > 0 ? 1.0 : vfx);
          const double offy = toy < 0 ? 0.0 : (toy > 0 ? 1.0 : vfy);
          const double u = ((double)nx + offx) * inv_count;
          const double v = ((double)ny + offy) * inv_count;
          double w[3];
          bool finite = slot_world(p, s, u, v, w);
          bool new_req = (l == 0);
          if (!new_req && finite) {
            const double dx = w[0] - p.view[0], dy = w[1] - p.view[1],
                         dz = w[2] - p.view[2];
            new_req = std::sqrt(dx * dx + dy * dy + dz * dz) < ld;
          }
          const int64_t old_x = tile_xy[2 * slot], old_y = tile_xy[2 * slot + 1];
          const bool was_req = requested[slot] != 0;
          const bool changed = (nx != old_x) || (ny != old_y);
          if (changed && was_req)
            released[nr++] = pack_key(s, l, old_x, old_y);
          if (!changed && was_req && !new_req)
            released[nr++] = pack_key(s, l, nx, ny);
          if (new_req && (changed || !was_req))
            requested_keys[nq++] = pack_key(s, l, nx, ny);
          tile_xy[2 * slot] = nx;
          tile_xy[2 * slot + 1] = ny;
          requested[slot] = new_req ? 1 : 0;
        }
      }
    }
  }
  *n_released = nr;
  *n_requested = nq;
}

void *tr_residency_create(int32_t atlas_size, int32_t attachment_count) {
  return new Residency(atlas_size, attachment_count);
}

void tr_residency_destroy(void *r) { delete static_cast<Residency *>(r); }

void tr_add_existing(void *r, const int64_t *keys, int64_t n) {
  auto *res = static_cast<Residency *>(r);
  for (int64_t i = 0; i < n; ++i) res->existing.insert(keys[i]);
}

void tr_clear_existing(void *r) {
  static_cast<Residency *>(r)->existing.clear();
}

int64_t tr_existing_count(void *r) {
  return static_cast<int64_t>(static_cast<Residency *>(r)->existing.size());
}

int32_t tr_request(void *r, int64_t key) {
  return static_cast<Residency *>(r)->request(key);
}

int32_t tr_release(void *r, int64_t key) {
  return static_cast<Residency *>(r)->release(key);
}

int32_t tr_loaded(void *r, int64_t key) {
  return static_cast<Residency *>(r)->loaded(key);
}

int32_t tr_get_or_allocate(void *r, int64_t key) {
  return static_cast<Residency *>(r)->get_or_allocate(key);
}

// Pop up to `cap` pending load entries into parallel output arrays.
int64_t tr_drain_loads(void *r, int64_t *keys, int32_t *indices,
                       int32_t *attachments, int64_t cap) {
  auto *res = static_cast<Residency *>(r);
  int64_t n = 0;
  while (n < cap && !res->to_load.empty()) {
    const LoadEntry &e = res->to_load.front();
    keys[n] = e.key;
    indices[n] = e.atlas_index;
    attachments[n] = e.attachment_index;
    res->to_load.pop_front();
    ++n;
  }
  return n;
}

void tr_best_tiles(void *r, const int32_t *side, const int32_t *lod,
                   const int32_t *x, const int32_t *y, int64_t n,
                   int32_t *out_index, int32_t *out_lod) {
  static_cast<Residency *>(r)->best_tiles(side, lod, x, y, n, out_index, out_lod);
}

int32_t tr_index_of(void *r, int64_t key) {
  auto *res = static_cast<Residency *>(r);
  auto it = res->states.find(key);
  return it == res->states.end() ? kInvalid : it->second.atlas_index;
}

int32_t tr_requests_of(void *r, int64_t key) {
  auto *res = static_cast<Residency *>(r);
  auto it = res->states.find(key);
  return it == res->states.end() ? -1 : it->second.requests;
}

int64_t tr_resident_count(void *r) {
  return static_cast<int64_t>(static_cast<Residency *>(r)->states.size());
}

void *tr_io_create(int32_t threads) { return new IoPool(threads); }

void tr_io_destroy(void *p) { delete static_cast<IoPool *>(p); }

void tr_io_submit(void *p, int64_t id, const char *path, uint8_t *buffer,
                  int64_t capacity) {
  static_cast<IoPool *>(p)->submit(id, path, buffer, capacity);
}

int64_t tr_io_poll(void *p, int64_t *ids, int64_t *sizes, int64_t cap) {
  return static_cast<IoPool *>(p)->poll(ids, sizes, cap);
}

}  // extern "C"
