// Native record-file reader: threaded batch assembly off the GIL.
//
// File format (written by utils/recordio.py):
//   magic   8  bytes  "MMTRECv1"
//   u32     schema_len
//   bytes   schema (opaque to C++; JSON parsed Python-side)
//   u32     record_size (bytes per fixed-size record)
//   u64     num_records
//   bytes   records, back to back
//
// A reader owns a pool of worker threads that pread() whole batches into
// a bounded queue of prepared buffers; Python pops batches with a single
// memcpy.  Shuffling is a per-epoch O(1) bijective index permutation
// (cycle-walking multiply-xor rounds, deterministic given the seed), so
// workers need no shared permutation array — and sharded readers
// (rio_start shard_id/num_shards) slice DISJOINT position ranges of the
// same permutation: exact per-host data partitioning with zero
// coordination.  A reader may span several files (rio_open_multi) that
// share one schema; records are addressed through cumulative counts.
// Iteration loops forever (the consumer counts epochs).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <numeric>
#include <string>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct FilePart {
  int fd = -1;
  uint64_t data_off = 0;
  uint64_t num_records = 0;
  uint64_t cum_records = 0;  // records in all parts BEFORE this one
};

struct Reader {
  std::vector<FilePart> parts;  // >= 1; equal record_size + schema
  uint32_t record_size = 0;
  uint64_t num_records = 0;  // total across parts
  std::string schema;

  // streaming state
  uint32_t batch_size = 0;
  uint64_t seed = 0;
  bool shuffle = false;
  uint64_t shard_base = 0;   // first owned position of each epoch's
  uint64_t shard_span = 0;   // permutation, and how many are owned
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  // batch index dispenser
  std::mutex idx_mu;
  uint64_t next_batch = 0;  // global monotonically increasing batch counter
  std::atomic<bool> error{false};  // an IO error occurred in a worker

  // prepared-batch queue, delivered IN ORDER of batch counter
  std::mutex q_mu;
  std::condition_variable q_ready, q_space;
  uint64_t next_delivered = 0;  // batch counter the consumer needs next
  size_t queue_cap = 4;
  // (counter, buffer) pairs; small so linear scan is fine
  std::deque<std::pair<uint64_t, std::vector<uint8_t>>> queue;

  uint64_t batches_per_epoch() const {
    return shard_span / batch_size;  // drop remainder
  }
};

uint64_t xorshift64(uint64_t x) {
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return x ? x : 0x9E3779B97F4A7C15ull;
}

// record index for position `pos` of epoch `epoch` under the reader's
// shuffle setting: a Feistel-ish index permutation, O(1) per lookup so
// workers need no shared permutation array.
uint64_t index_at(const Reader &r, uint64_t epoch, uint64_t pos) {
  if (!r.shuffle) return pos;
  // two rounds of multiply-xor-mod over [0, num_records): not a perfect
  // cipher but a bijection is required — use cycle-walking over a
  // power-of-two domain.
  uint64_t n = r.num_records;
  uint64_t bits = 1;
  while ((1ull << bits) < n) ++bits;
  uint64_t mask = (1ull << bits) - 1;
  uint64_t k1 = xorshift64(r.seed + 0x1234567 + epoch * 0x9E3779B97F4A7C15ull);
  uint64_t k2 = xorshift64(k1);
  uint64_t x = pos;
  do {
    // two rounds of an invertible mix over the 2^bits domain
    x = (x * 0x9E3779B97F4A7C15ull + k1) & mask;
    x ^= x >> (bits / 2 + 1);
    x = (x * 0xBF58476D1CE4E5B9ull + k2) & mask;
    x ^= x >> (bits / 2 + 1);
    x &= mask;
  } while (x >= n);
  return x;
}

// global record index -> owning file part (binary search over the
// cumulative counts; a handful of parts, but keep it O(log n))
const FilePart &part_of(const Reader &r, uint64_t rec, uint64_t *local) {
  size_t lo = 0, hi = r.parts.size() - 1;
  while (lo < hi) {
    size_t mid = (lo + hi + 1) / 2;
    if (r.parts[mid].cum_records <= rec) lo = mid;
    else hi = mid - 1;
  }
  *local = rec - r.parts[lo].cum_records;
  return r.parts[lo];
}

void worker_main(Reader *r) {
  const uint64_t bpe = r->batches_per_epoch();
  std::vector<uint8_t> buf;
  while (!r->stop.load(std::memory_order_relaxed)) {
    uint64_t counter;
    {
      std::lock_guard<std::mutex> g(r->idx_mu);
      counter = r->next_batch++;
    }
    uint64_t epoch = counter / bpe;
    uint64_t batch_in_epoch = counter % bpe;

    buf.resize((size_t)r->batch_size * r->record_size);
    for (uint32_t i = 0; i < r->batch_size; ++i) {
      // this shard owns positions [shard_base, shard_base + shard_span)
      // of the epoch's permutation — disjoint across shards by
      // construction (the permutation is a bijection)
      uint64_t rec = index_at(
          *r, epoch, r->shard_base + batch_in_epoch * r->batch_size + i);
      uint64_t local = 0;
      const FilePart &p = part_of(*r, rec, &local);
      off_t off = (off_t)(p.data_off + local * (uint64_t)r->record_size);
      size_t want = r->record_size, got = 0;
      while (got < want) {
        ssize_t k = pread(p.fd, buf.data() + (size_t)i * r->record_size + got,
                          want - got, off + (off_t)got);
        if (k <= 0) {
          // IO error / truncated file: this worker has already claimed a
          // batch counter the consumer is waiting for — flag the error and
          // wake everyone so rio_next_batch fails instead of hanging
          r->error.store(true, std::memory_order_relaxed);
          std::lock_guard<std::mutex> g(r->q_mu);
          r->q_ready.notify_all();
          r->q_space.notify_all();
          return;
        }
        got += (size_t)k;
      }
    }

    // slot reservation is BY COUNTER: a worker may insert exactly when its
    // batch is within queue_cap of the next delivery, so the batch the
    // consumer is waiting for can always get in (no deadlock with a queue
    // full of future batches), and at most queue_cap batches are queued.
    std::unique_lock<std::mutex> lk(r->q_mu);
    r->q_space.wait(lk, [&] {
      return r->stop.load(std::memory_order_relaxed) ||
             counter < r->next_delivered + r->queue_cap;
    });
    if (r->stop.load(std::memory_order_relaxed)) return;
    if (counter < r->next_delivered) continue;  // rio_skip passed this batch
    r->queue.emplace_back(counter, std::move(buf));
    buf = std::vector<uint8_t>();
    r->q_ready.notify_all();
  }
}

}  // namespace

// Open ONE file, appending a validated part to the reader.  Every part
// must agree on record_size and schema (same logical dataset, split into
// shardable pieces).  Returns false (and leaves the reader untouched
// beyond closed fds) on any failure.
bool open_part(Reader *r, const char *path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  char magic[8];
  uint32_t schema_len = 0;
  if (pread(fd, magic, 8, 0) != 8 || memcmp(magic, "MMTRECv1", 8) != 0 ||
      pread(fd, &schema_len, 4, 8) != 4) {
    close(fd);
    return false;
  }
  std::string schema(schema_len, '\0');
  uint64_t off = 12;
  if (pread(fd, schema.data(), schema_len, (off_t)off) !=
      (ssize_t)schema_len) {
    close(fd);
    return false;
  }
  off += schema_len;
  uint32_t record_size = 0;
  uint64_t num_records = 0;
  if (pread(fd, &record_size, 4, (off_t)off) != 4 ||
      pread(fd, &num_records, 8, (off_t)(off + 4)) != 8) {
    close(fd);
    return false;
  }
  if (r->parts.empty()) {
    r->record_size = record_size;
    r->schema = schema;
  } else if (record_size != r->record_size || schema != r->schema) {
    close(fd);
    return false;  // incompatible part
  }
  FilePart p;
  p.fd = fd;
  p.data_off = off + 12;
  p.num_records = num_records;
  p.cum_records = r->num_records;
  r->parts.push_back(p);
  r->num_records += num_records;
  return true;
}

Reader *free_reader(Reader *r) {
  for (auto &p : r->parts)
    if (p.fd >= 0) close(p.fd);
  delete r;
  return nullptr;
}

extern "C" {

void *rio_open(const char *path) {
  auto *r = new Reader();
  if (!open_part(r, path)) return free_reader(r);
  return r;
}

// paths: '\n'-separated list (simplest stable ctypes marshalling).  All
// parts must share record_size and schema.
void *rio_open_multi(const char *paths) {
  auto *r = new Reader();
  std::string all(paths);
  size_t start = 0;
  while (start <= all.size()) {
    size_t nl = all.find('\n', start);
    std::string one = all.substr(
        start, nl == std::string::npos ? std::string::npos : nl - start);
    if (!one.empty() && !open_part(r, one.c_str())) return free_reader(r);
    if (nl == std::string::npos) break;
    start = nl + 1;
  }
  if (r->parts.empty()) return free_reader(r);
  return r;
}

uint64_t rio_num_records(void *h) { return ((Reader *)h)->num_records; }
uint32_t rio_record_size(void *h) { return ((Reader *)h)->record_size; }

int rio_schema(void *h, char *out, int cap) {
  auto *r = (Reader *)h;
  int n = (int)r->schema.size();
  if (out && cap >= n) memcpy(out, r->schema.data(), n);
  return n;
}

// shard_id/num_shards: this reader yields only its own 1/num_shards of
// every epoch (disjoint across shards) — per-host data parallelism.
int rio_start(void *h, uint32_t batch_size, int num_threads, uint64_t seed,
              int shuffle, int queue_depth, uint32_t shard_id,
              uint32_t num_shards) {
  auto *r = (Reader *)h;
  if (num_shards == 0 || shard_id >= num_shards) return -1;
  r->shard_span = r->num_records / num_shards;
  r->shard_base = (uint64_t)shard_id * r->shard_span;
  if (batch_size == 0 || batch_size > r->shard_span) return -1;
  r->batch_size = batch_size;
  r->seed = seed;
  r->shuffle = shuffle != 0;
  r->queue_cap = queue_depth > 0 ? (size_t)queue_depth : 4;
  r->stop.store(false);
  for (int i = 0; i < (num_threads > 0 ? num_threads : 2); ++i)
    r->workers.emplace_back(worker_main, r);
  return 0;
}

// Fast-forward the stream by n batches WITHOUT reading them — O(1):
// record selection is a pure function of the batch counter (index_at), so
// advancing the delivery horizon and the dispenser is exact.  Prepared
// batches now below the horizon are dropped; workers mid-read of a
// skipped counter discard their result on insert.  Used by
// RecordReader.restore_state for mid-epoch resume.
void rio_skip(void *h, uint64_t n) {
  auto *r = (Reader *)h;
  {
    std::lock_guard<std::mutex> g(r->q_mu);
    r->next_delivered += n;
    for (auto it = r->queue.begin(); it != r->queue.end();) {
      if (it->first < r->next_delivered) it = r->queue.erase(it);
      else ++it;
    }
  }
  {
    std::lock_guard<std::mutex> g(r->idx_mu);
    if (r->next_batch < r->next_delivered) r->next_batch = r->next_delivered;
  }
  std::lock_guard<std::mutex> g(r->q_mu);
  r->q_space.notify_all();  // the window moved; let waiting workers insert
  r->q_ready.notify_all();  // and re-scan any consumer mid-wait
}

// Blocks until the IN-ORDER next batch is ready; copies it into out.
// Returns 0 on success, -1 on shutdown, -2 on a worker IO error.
int rio_next_batch(void *h, uint8_t *out) {
  auto *r = (Reader *)h;
  std::unique_lock<std::mutex> lk(r->q_mu);
  for (;;) {
    for (auto it = r->queue.begin(); it != r->queue.end(); ++it) {
      if (it->first == r->next_delivered) {
        memcpy(out, it->second.data(), it->second.size());
        r->queue.erase(it);
        r->next_delivered++;
        r->q_space.notify_all();
        return 0;
      }
    }
    if (r->error.load(std::memory_order_relaxed)) return -2;
    r->q_ready.wait(lk);
    if (r->stop.load(std::memory_order_relaxed)) return -1;
    if (r->error.load(std::memory_order_relaxed)) return -2;
  }
}

void rio_close(void *h) {
  auto *r = (Reader *)h;
  r->stop.store(true);
  {
    std::lock_guard<std::mutex> g(r->q_mu);
    r->q_ready.notify_all();
    r->q_space.notify_all();
  }
  for (auto &t : r->workers)
    if (t.joinable()) t.join();
  free_reader(r);
}

}  // extern "C"
