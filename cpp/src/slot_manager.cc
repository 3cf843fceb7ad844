#include "wtpu/slot_manager.h"

namespace wtpu {

SlotManager::SlotManager(int num_slots) : num_slots_(num_slots) {
  active_.resize(num_slots);
  for (auto& r : active_) r.id = -1;
}

int64_t SlotManager::Submit(const float* audio, int64_t n_samples) {
  std::lock_guard<std::mutex> lock(mu_);
  Request req;
  req.id = next_id_++;
  req.audio.assign(audio, audio + n_samples);
  queue_.push_back(std::move(req));
  return queue_.back().id;
}

int SlotManager::Schedule(std::vector<SlotView>* slots) {
  std::lock_guard<std::mutex> lock(mu_);
  int active = 0;
  slots->resize(num_slots_);
  for (int s = 0; s < num_slots_; ++s) {
    if (active_[s].id < 0 && !queue_.empty()) {
      active_[s] = std::move(queue_.front());
      queue_.pop_front();
    }
    auto& r = active_[s];
    auto& view = (*slots)[s];
    view.request_id = r.id;
    view.audio = r.id >= 0 ? r.audio.data() : nullptr;
    view.n_samples = r.id >= 0 ? static_cast<int64_t>(r.audio.size()) : 0;
    if (r.id >= 0) ++active;
  }
  return active;
}

void SlotManager::Complete(int slot, const int32_t* tokens, int64_t n_tokens) {
  std::lock_guard<std::mutex> lock(mu_);
  if (slot < 0 || slot >= num_slots_ || active_[slot].id < 0) return;
  results_[active_[slot].id].assign(tokens, tokens + n_tokens);
  active_[slot].id = -1;
  active_[slot].audio.clear();
}

bool SlotManager::Fetch(int64_t request_id, std::vector<int32_t>* tokens) {
  std::lock_guard<std::mutex> lock(mu_);
  auto it = results_.find(request_id);
  if (it == results_.end()) return false;
  *tokens = std::move(it->second);
  results_.erase(it);
  return true;
}

int64_t SlotManager::pending() const {
  std::lock_guard<std::mutex> lock(mu_);
  return static_cast<int64_t>(queue_.size());
}

}  // namespace wtpu
