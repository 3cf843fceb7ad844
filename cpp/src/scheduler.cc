#include "wtpu/scheduler.h"

#include <algorithm>

namespace wtpu {

BatchScheduler::BatchScheduler(std::vector<int> allowed_batch_sizes,
                               int64_t max_wait_ms)
    : allowed_(std::move(allowed_batch_sizes)), max_wait_ms_(max_wait_ms) {}

void BatchScheduler::Submit(int64_t request_id, int priority,
                            int64_t timeout_ms) {
  std::lock_guard<std::mutex> lock(mu_);
  Item it;
  it.id = request_id;
  it.priority = priority;
  it.enqueue = Clock::now();
  it.has_deadline = timeout_ms > 0;
  it.deadline = it.has_deadline
                    ? it.enqueue + std::chrono::milliseconds(timeout_ms)
                    : Clock::time_point::max();
  // insert keeping (priority desc, enqueue asc) order: scan from the back
  // (amortized O(1) for same-priority FIFO traffic)
  auto pos = queue_.end();
  while (pos != queue_.begin()) {
    auto prev = pos - 1;
    if (prev->priority >= it.priority) break;
    pos = prev;
  }
  queue_.insert(pos, it);
  ++stats_.submitted;
}

void BatchScheduler::DropExpiredLocked(Clock::time_point now,
                                       std::vector<int64_t>* out) {
  for (auto it = queue_.begin(); it != queue_.end();) {
    if (it->has_deadline && it->deadline <= now) {
      if (out) out->push_back(it->id);
      ++stats_.expired;
      it = queue_.erase(it);
    } else {
      ++it;
    }
  }
}

int BatchScheduler::FormBatchLocked(int want, std::vector<int64_t>* batch) {
  auto now = Clock::now();
  for (int i = 0; i < want; ++i) {
    const Item& it = queue_.front();
    batch->push_back(it.id);
    int64_t delay =
        std::chrono::duration_cast<std::chrono::microseconds>(now - it.enqueue)
            .count();
    if (static_cast<int>(stats_.delays_us.size()) <
        SchedulerStats::kDelayWindow) {
      stats_.delays_us.push_back(delay);
    } else {
      stats_.delays_us[stats_.delays_next %
                       SchedulerStats::kDelayWindow] = delay;
    }
    ++stats_.delays_next;
    queue_.pop_front();
  }
  if (want > 0) {
    ++stats_.launched_batches;
    stats_.launched_requests += want;
  }
  return want;
}

int BatchScheduler::Poll(std::vector<int64_t>* batch,
                         std::vector<int64_t>* expired) {
  std::lock_guard<std::mutex> lock(mu_);
  batch->clear();
  if (expired) expired->clear();
  auto now = Clock::now();
  DropExpiredLocked(now, expired);
  if (queue_.empty()) return 0;

  int pending = static_cast<int>(queue_.size());
  int full = allowed_.back();
  if (pending >= full) return FormBatchLocked(full, batch);

  auto oldest_wait = std::chrono::duration_cast<std::chrono::milliseconds>(
                         now - queue_.front().enqueue)
                         .count();
  // the front item is highest-priority but not necessarily oldest — the
  // tail-latency guard checks the whole queue's oldest enqueue
  for (const Item& it : queue_) {
    auto w = std::chrono::duration_cast<std::chrono::milliseconds>(
                 now - it.enqueue)
                 .count();
    if (w > oldest_wait) oldest_wait = w;
  }
  if (oldest_wait < max_wait_ms_) return 0;

  // largest allowed size <= pending; if even the smallest exceeds pending,
  // launch pending at the smallest size (caller pads the batch)
  int want = allowed_.front() < pending ? allowed_.front() : pending;
  for (int s : allowed_)
    if (s <= pending && s > want) want = s;
  return FormBatchLocked(want, batch);
}

int BatchScheduler::Flush(std::vector<int64_t>* batch) {
  std::lock_guard<std::mutex> lock(mu_);
  batch->clear();
  int pending = static_cast<int>(queue_.size());
  if (pending == 0) return 0;
  int want = pending < allowed_.back() ? pending : allowed_.back();
  return FormBatchLocked(want, batch);
}

int64_t BatchScheduler::pending() const {
  std::lock_guard<std::mutex> lock(mu_);
  return static_cast<int64_t>(queue_.size());
}

SchedulerStats BatchScheduler::stats() const {
  std::lock_guard<std::mutex> lock(mu_);
  return stats_;
}

}  // namespace wtpu
