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

extern "C" {

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
