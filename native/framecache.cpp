// Host-side frame cache + async prefetcher.
//
// Native successor of the reference's frame-IO runtime: the "bigblock"
// pre-carved frame buffers (src/memory.c, memory.h:285-291), the threaded
// frame puller (pull_frame_threaded, src/frameloader.c:34) and the player's
// predictive pre-cache (src/player.c:2185-2230). A fixed slab of frame-sized
// buffers is filled ahead of the consumer by pthread workers doing pread()
// on raw frame streams (y4m / raw pcm / image blobs), so the Python player
// never blocks on disk.
//
// C ABI, consumed via ctypes (lives_tpu/native/__init__.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <map>
#include <mutex>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Slot {
  std::vector<uint8_t> buf;
  int64_t frame = -1;          // frame index held, -1 = free
  int state = 0;               // 0 empty, 1 loading, 2 ready, 3 error
  int64_t last_use = 0;        // LRU tick
  int pins = 0;                // consumer holds
};

struct Stream {
  int fd = -1;
  int64_t data_start = 0;      // offset of first frame payload
  int64_t frame_size = 0;      // payload bytes per frame
  int64_t stride = 0;          // bytes between consecutive frame payloads
  int64_t nframes = 0;
};

class FrameCache {
 public:
  FrameCache(int n_slots, int64_t slot_size, int n_workers)
      : slot_size_(slot_size), stop_(false), tick_(0),
        hits_(0), misses_(0) {
    slots_.resize(n_slots);
    for (auto& s : slots_) s.buf.resize(slot_size);
    for (int i = 0; i < n_workers; i++)
      workers_.emplace_back([this] { worker(); });
  }

  ~FrameCache() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
    if (stream_.fd >= 0) ::close(stream_.fd);
  }

  bool open_stream(const char* path, int64_t data_start, int64_t frame_size,
                   int64_t stride, int64_t nframes) {
    // Validate before touching any state: a failed open must leave the
    // previous stream fully usable (callers may ignore the return value),
    // and an oversized frame_size must never reach the pread path (it
    // would overflow the slot buffers through the C ABI).
    if (frame_size <= 0 || frame_size > slot_size_) return false;
    int newfd = ::open(path, O_RDONLY);
    if (newfd < 0) return false;
    std::unique_lock<std::mutex> lk(mu_);
    // Quiesce: drop pending work, then wait until no worker is mid-pread
    // on the old fd before closing it (closing under a concurrent pread
    // races with descriptor reuse).
    queue_.clear();
    while (reads_in_flight_ > 0) cv_ready_.wait(lk);
    if (stream_.fd >= 0) ::close(stream_.fd);
    stream_.fd = newfd;
    stream_.data_start = data_start;
    stream_.frame_size = frame_size;
    stream_.stride = stride;
    stream_.nframes = nframes;
    for (auto& s : slots_) { s.frame = -1; s.state = 0; s.pins = 0; }
    return true;
  }

  // enqueue prefetch of [start, start+count) (dedup'd)
  void request(int64_t start, int64_t count) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int64_t f = start; f < start + count; f++) {
      if (f < 0 || f >= stream_.nframes) continue;
      if (find_slot(f) >= 0) continue;
      bool queued = false;
      for (auto q : queue_) if (q == f) { queued = true; break; }
      if (!queued) queue_.push_back(f);
    }
    cv_work_.notify_all();
  }

  // blocking fetch; returns pinned pointer or null on timeout/error
  const uint8_t* acquire(int64_t frame, int timeout_ms) {
    std::unique_lock<std::mutex> lk(mu_);
    int idx = find_slot(frame);
    if (idx >= 0 && slots_[idx].state == 2) {
      hits_++;
    } else {
      misses_++;
      bool queued = false;
      for (auto q : queue_) if (q == frame) { queued = true; break; }
      if (!queued && idx < 0) queue_.push_front(frame);  // priority
      cv_work_.notify_all();
      auto deadline = std::chrono::steady_clock::now() +
                      std::chrono::milliseconds(timeout_ms);
      while (true) {
        idx = find_slot(frame);
        if (idx >= 0 && slots_[idx].state == 2) break;
        if (idx >= 0 && slots_[idx].state == 3) return nullptr;
        if (cv_ready_.wait_until(lk, deadline) ==
            std::cv_status::timeout) return nullptr;
      }
    }
    slots_[idx].pins++;
    slots_[idx].last_use = ++tick_;
    return slots_[idx].buf.data();
  }

  void release(int64_t frame) {
    std::lock_guard<std::mutex> lk(mu_);
    int idx = find_slot(frame);
    if (idx >= 0 && slots_[idx].pins > 0) slots_[idx].pins--;
  }

  void stats(int64_t* hits, int64_t* misses) {
    *hits = hits_;
    *misses = misses_;
  }

 private:
  int find_slot(int64_t frame) {
    for (size_t i = 0; i < slots_.size(); i++)
      if (slots_[i].frame == frame && slots_[i].state != 0)
        return (int)i;
    return -1;
  }

  int evict_slot() {  // caller holds mu_
    int best = -1;
    int64_t best_use = INT64_MAX;
    for (size_t i = 0; i < slots_.size(); i++) {
      auto& s = slots_[i];
      if (s.state == 1 || s.pins > 0) continue;
      if (s.state == 0) return (int)i;
      if (s.last_use < best_use) { best_use = s.last_use; best = (int)i; }
    }
    return best;
  }

  void worker() {
    std::unique_lock<std::mutex> lk(mu_);
    while (true) {
      cv_work_.wait(lk, [this] { return stop_ || !queue_.empty(); });
      if (stop_) return;
      int64_t frame = queue_.front();
      queue_.pop_front();
      if (find_slot(frame) >= 0) continue;
      int idx = evict_slot();
      if (idx < 0) { queue_.push_back(frame); cv_ready_.wait_for(
          lk, std::chrono::milliseconds(5)); continue; }
      Slot& s = slots_[idx];
      s.frame = frame;
      s.state = 1;
      int fd = stream_.fd;
      int64_t ofs = stream_.data_start + frame * stream_.stride;
      int64_t size = stream_.frame_size;
      reads_in_flight_++;
      lk.unlock();
      ssize_t got = 0;
      while (got < size) {
        ssize_t r = ::pread(fd, s.buf.data() + got, size - got, ofs + got);
        if (r <= 0) break;
        got += r;
      }
      lk.lock();
      reads_in_flight_--;
      s.state = (got == size) ? 2 : 3;
      cv_ready_.notify_all();
    }
  }

  int64_t slot_size_;
  std::vector<Slot> slots_;
  Stream stream_;
  std::deque<int64_t> queue_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_ready_;
  bool stop_;
  int reads_in_flight_ = 0;
  int64_t tick_;
  std::atomic<int64_t> hits_, misses_;
};

}  // namespace

extern "C" {

void* fc_create(int n_slots, int64_t slot_size, int n_workers) {
  return new FrameCache(n_slots, slot_size, n_workers);
}

void fc_destroy(void* h) { delete static_cast<FrameCache*>(h); }

int fc_open_stream(void* h, const char* path, int64_t data_start,
                   int64_t frame_size, int64_t stride, int64_t nframes) {
  return static_cast<FrameCache*>(h)->open_stream(
             path, data_start, frame_size, stride, nframes) ? 1 : 0;
}

void fc_request(void* h, int64_t start, int64_t count) {
  static_cast<FrameCache*>(h)->request(start, count);
}

const uint8_t* fc_acquire(void* h, int64_t frame, int timeout_ms) {
  return static_cast<FrameCache*>(h)->acquire(frame, timeout_ms);
}

void fc_release(void* h, int64_t frame) {
  static_cast<FrameCache*>(h)->release(frame);
}

void fc_stats(void* h, int64_t* hits, int64_t* misses) {
  static_cast<FrameCache*>(h)->stats(hits, misses);
}

}  // extern "C"
