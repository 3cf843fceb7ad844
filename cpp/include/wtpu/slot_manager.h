// Request queue + batch slot manager for continuous serving.
//
// Native equivalent of the reference's in-flight batching substrate
// (reference: cpp/tensorrt_llm/batch_manager/batchSlotManager.h,
// trtGptModelInflightBatching.h; protocol docs/in_flight_batching.md:16-50):
// requests enter a thread-safe queue, a fixed number of batch slots is
// filled each scheduling round, finished slots are recycled. The device-side
// decode stays shape-static; this layer only decides which utterance rides
// in which batch lane.

#pragma once

#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace wtpu {

struct SlotView {
  int64_t request_id;  // -1 if the slot is idle
  const float* audio;  // borrowed pointer, valid until Complete()
  int64_t n_samples;
};

class SlotManager {
 public:
  explicit SlotManager(int num_slots);

  // Enqueue a request; returns its id. Copies the audio.
  int64_t Submit(const float* audio, int64_t n_samples);

  // Fill idle slots from the queue. Returns number of active slots and
  // writes per-slot views (size num_slots).
  int Schedule(std::vector<SlotView>* slots);

  // Mark a slot's request finished; frees the slot and stores the result
  // (token ids) for retrieval.
  void Complete(int slot, const int32_t* tokens, int64_t n_tokens);

  // Pop a finished result. Returns false if request_id isn't finished yet.
  bool Fetch(int64_t request_id, std::vector<int32_t>* tokens);

  int num_slots() const { return num_slots_; }
  int64_t pending() const;

 private:
  struct Request {
    int64_t id;
    std::vector<float> audio;
  };

  const int num_slots_;
  mutable std::mutex mu_;
  int64_t next_id_ = 1;
  std::deque<Request> queue_;
  std::vector<Request> active_;       // slot -> request (id==-1 if idle)
  std::unordered_map<int64_t, std::vector<int32_t>> results_;
};

}  // namespace wtpu
