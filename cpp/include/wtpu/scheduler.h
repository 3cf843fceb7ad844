// Batch-forming request scheduler for the lockstep serving path.
//
// Native equivalent of the reference's batch_manager scheduling policy
// (reference: cpp/tensorrt_llm/batch_manager/trtGptModelInflightBatching.h,
// GptManager request pickup in docs/in_flight_batching.md:16-50): decides
// WHEN to launch a batch and WHICH requests ride in it. The SlotManager
// (slot_manager.h) binds requests to fixed lanes for continuous batching;
// this scheduler instead forms whole lockstep batches whose sizes match
// the pre-compiled executables (XLA programs are shape-static, so batch
// sizes come from a fixed allowlist and the policy picks the largest one
// that is ready).
//
// Policy, evaluated at every Poll():
//   - drop requests whose deadline expired (recorded, reported to stats)
//   - launch when the highest allowed batch size is fillable, OR
//   - launch whatever is pending once the oldest request has waited
//     >= max_wait_ms (tail-latency guard), picking the largest allowed
//     size <= pending.
//   - within the queue, higher priority first; FIFO within a priority.

#pragma once

#include <chrono>
#include <cstdint>
#include <deque>
#include <mutex>
#include <vector>

namespace wtpu {

struct SchedulerStats {
  int64_t submitted = 0;
  int64_t launched_batches = 0;
  int64_t launched_requests = 0;
  int64_t expired = 0;
  // queue delay (submit -> launch) in microseconds: a bounded ring of the
  // most recent kDelayWindow launches (a long-running daemon must not grow
  // without bound, and stats() copies under the scheduler mutex)
  static constexpr int kDelayWindow = 4096;
  std::vector<int64_t> delays_us;   // ring storage, size <= kDelayWindow
  int64_t delays_next = 0;          // ring write index
};

class BatchScheduler {
 public:
  // allowed_batch_sizes must be ascending and non-empty (e.g. {1,2,4,8,16}).
  BatchScheduler(std::vector<int> allowed_batch_sizes, int64_t max_wait_ms);

  // Enqueue a request id (payloads live elsewhere, e.g. SlotManager or the
  // Python side). timeout_ms <= 0 means no deadline.
  void Submit(int64_t request_id, int priority, int64_t timeout_ms);

  // Evaluate the policy. Fills `batch` with the ids to launch (possibly
  // empty) and `expired` with ids dropped this round. Returns batch size.
  int Poll(std::vector<int64_t>* batch, std::vector<int64_t>* expired);

  // Force-launch pending work (shutdown/flush): returns ONE batch of at
  // most the largest allowed size — call repeatedly until it returns 0.
  // Never exceeds the allowed maximum, so every flushed batch still maps
  // to a pre-compiled executable shape (callers pad partial batches).
  int Flush(std::vector<int64_t>* batch);

  int64_t pending() const;
  SchedulerStats stats() const;

 private:
  using Clock = std::chrono::steady_clock;
  struct Item {
    int64_t id;
    int priority;
    Clock::time_point enqueue;
    Clock::time_point deadline;  // time_point::max() if none
    bool has_deadline;
  };

  void DropExpiredLocked(Clock::time_point now, std::vector<int64_t>* out);
  int FormBatchLocked(int want, std::vector<int64_t>* batch);

  const std::vector<int> allowed_;
  const int64_t max_wait_ms_;
  mutable std::mutex mu_;
  std::deque<Item> queue_;
  SchedulerStats stats_;
};

}  // namespace wtpu
