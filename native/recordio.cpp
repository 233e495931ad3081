// Native RecordIO reader for gslora_tpu.
//
// TPU-native replacement for the reference's mxnet recordio C++ dependency
// (image_iter.py:18-86): parses .idx offset tables, validates record
// framing, and serves batched payload reads with a thread pool over
// pread(2) — the host-side IO path that feeds the input pipeline while the
// device computes. Exposed to Python via ctypes (gslora_tpu/native).
//
// Record layout (mxnet recordio.h): u32 magic 0xced7230a | u32 lrecord
// (upper 3 bits continuation flag, lower 29 payload length) | payload |
// pad to 4 bytes. Payload begins with IRHeader {u32 flag; f32 label;
// u64 id; u64 id2}; flag>0 => `flag` f32 labels follow.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>

#include <atomic>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0xced7230a;

struct Handle {
  int fd = -1;
  std::vector<int64_t> keys;
  std::vector<int64_t> offsets;  // parallel to keys
};

#pragma pack(push, 1)
struct IRHeader {
  uint32_t flag;
  float label;
  uint64_t id;
  uint64_t id2;
};
#pragma pack(pop)

}  // namespace

extern "C" {

// Open a .rec (+ .idx) pair. Returns an opaque handle or nullptr.
void* ri_open(const char* rec_path, const char* idx_path) {
  auto* h = new Handle();
  h->fd = open(rec_path, O_RDONLY);
  if (h->fd < 0) {
    delete h;
    return nullptr;
  }
  std::ifstream idx(idx_path);
  if (!idx) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  // strict line-based parse: a malformed line FAILS the open instead of
  // silently truncating the dataset at that point (the pure-python reader
  // processes the whole file — the two readers must agree)
  std::string line;
  while (std::getline(idx, line)) {
    if (line.find_first_not_of(" \t\r\n") == std::string::npos) continue;
    char extra;
    int64_t key, off;
    if (sscanf(line.c_str(), "%ld %ld %c", &key, &off, &extra) != 2) {
      close(h->fd);
      delete h;
      return nullptr;
    }
    h->keys.push_back(key);
    h->offsets.push_back(off);
  }
  return h;
}

void ri_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (!h) return;
  if (h->fd >= 0) close(h->fd);
  delete h;
}

int64_t ri_num_records(void* handle) {
  return static_cast<Handle*>(handle)->keys.size();
}

int64_t ri_keys(void* handle, int64_t* out, int64_t cap) {
  auto* h = static_cast<Handle*>(handle);
  int64_t n = std::min<int64_t>(cap, h->keys.size());
  std::memcpy(out, h->keys.data(), n * sizeof(int64_t));
  return n;
}

// Read record payload at index `i` (position in the idx table, NOT key).
// Fills label (first label float), writes body bytes into out (cap bytes).
// Returns body length, or -1 on error, or required size if cap too small
// (call again with a bigger buffer).
int64_t ri_read(void* handle, int64_t i, float* label, uint8_t* out,
                int64_t cap) {
  auto* h = static_cast<Handle*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(h->offsets.size())) return -1;
  uint32_t hdr[2];
  if (pread(h->fd, hdr, 8, h->offsets[i]) != 8) return -1;
  if (hdr[0] != kMagic) return -1;
  // upper 3 bits = continuation flag: nonzero marks a multi-part record
  // (mxnet recordio chunking) — fail loudly rather than serve the first
  // chunk as a complete (truncated) record
  if ((hdr[1] >> 29) != 0) return -1;
  int64_t len = hdr[1] & ((1u << 29) - 1);
  if (len < static_cast<int64_t>(sizeof(IRHeader))) return -1;
  std::vector<uint8_t> payload(len);
  if (pread(h->fd, payload.data(), len, h->offsets[i] + 8) != len) return -1;
  IRHeader ir;
  std::memcpy(&ir, payload.data(), sizeof(IRHeader));
  int64_t body_off = sizeof(IRHeader);
  if (ir.flag > 0) {
    // validate the label count against the payload: a corrupt flag would
    // otherwise read out of bounds and wrap body_len negative (heap OOB /
    // giant memcpy — confirmed crash on fuzzed records)
    body_off += 4 * static_cast<int64_t>(ir.flag);
    if (body_off > len) return -1;
    std::memcpy(label, payload.data() + sizeof(IRHeader), sizeof(float));
  } else {
    *label = ir.label;
  }
  int64_t body_len = len - body_off;
  if (body_len > cap) return body_len;  // caller retries with bigger buffer
  std::memcpy(out, payload.data() + body_off, body_len);
  return body_len;
}

// Batched threaded read: for n indices, write payloads back-to-back into
// `out` (total capacity cap); lengths[j] receives each body length and
// starts[j] its offset in `out`. labels[j] receives the first label.
// Returns 0 on success, -1 on any record error, -2 if cap is too small.
int ri_read_batch(void* handle, const int64_t* idxs, int64_t n,
                  float* labels, uint8_t* out, int64_t cap,
                  int64_t* starts, int64_t* lengths, int n_threads) {
  auto* h = static_cast<Handle*>(handle);
  // pass 1: sizes from the framing headers (cheap pread of 8 bytes each)
  std::vector<int64_t> sizes(n);
  std::atomic<int> err{0};
  auto size_worker = [&](int64_t lo, int64_t hi) {
    for (int64_t j = lo; j < hi; ++j) {
      uint32_t hdr[2];
      int64_t i = idxs[j];
      if (i < 0 || i >= static_cast<int64_t>(h->offsets.size()) ||
          pread(h->fd, hdr, 8, h->offsets[i]) != 8 || hdr[0] != kMagic ||
          (hdr[1] >> 29) != 0) {
        err = 1;
        return;
      }
      sizes[j] = hdr[1] & ((1u << 29) - 1);
      if (sizes[j] < static_cast<int64_t>(sizeof(IRHeader))) {
        err = 1;
        return;
      }
    }
  };
  int nt = n_threads > 0 ? n_threads : 4;
  {
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
      if (lo < hi) ts.emplace_back(size_worker, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
  if (err) return -1;
  int64_t total = 0;
  for (int64_t j = 0; j < n; ++j) {
    starts[j] = total;
    total += sizes[j];  // upper bound (body <= payload)
  }
  if (total > cap) return -2;

  // pass 2: pread each payload DIRECTLY into its slot (sizes/offsets are
  // known from pass 1 — no second header pread, no temp buffer), parse
  // the IRHeader in place and slide the body to the slot start
  auto read_worker = [&](int64_t lo, int64_t hi) {
    for (int64_t j = lo; j < hi; ++j) {
      int64_t len = sizes[j];
      uint8_t* slot = out + starts[j];
      if (pread(h->fd, slot, len, h->offsets[idxs[j]] + 8) != len) {
        err = 1;
        return;
      }
      IRHeader ir;
      std::memcpy(&ir, slot, sizeof(IRHeader));
      int64_t body_off = sizeof(IRHeader);
      if (ir.flag > 0) {
        body_off += 4 * static_cast<int64_t>(ir.flag);
        if (body_off > len) {  // corrupt label count (see ri_read)
          err = 1;
          return;
        }
        std::memcpy(&labels[j], slot + sizeof(IRHeader), sizeof(float));
      } else {
        labels[j] = ir.label;
      }
      std::memmove(slot, slot + body_off, len - body_off);
      lengths[j] = len - body_off;
    }
  };
  {
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
      if (lo < hi) ts.emplace_back(read_worker, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
  return err ? -1 : 0;
}

}  // extern "C"
