// C ABI for the native runtime pieces (consumed via ctypes — the Python/C++
// boundary the reference crosses through torch extension ops, reference:
// cpp/tensorrt_llm/thop/; here a plain C API, no torch).

#include <cstdint>
#include <cstring>
#include <vector>

#include "wtpu/slot_manager.h"
#include "wtpu/wav.h"

extern "C" {

// ---- WAV ------------------------------------------------------------------

// Decode+resample; returns number of samples, or -1 on error. Caller passes
// a maximum capacity buffer.
int64_t wtpu_load_wav16k(const uint8_t* data, int64_t size, float* out,
                         int64_t capacity) {
  std::vector<float> samples;
  if (!wtpu::LoadWav16k(data, static_cast<size_t>(size), &samples)) return -1;
  int64_t n = static_cast<int64_t>(samples.size());
  if (n > capacity) n = capacity;
  std::memcpy(out, samples.data(), n * sizeof(float));
  return n;
}

// ---- SlotManager ------------------------------------------------------------

void* wtpu_slot_manager_new(int num_slots) {
  return new wtpu::SlotManager(num_slots);
}

void wtpu_slot_manager_free(void* sm) {
  delete static_cast<wtpu::SlotManager*>(sm);
}

int64_t wtpu_submit(void* sm, const float* audio, int64_t n_samples) {
  return static_cast<wtpu::SlotManager*>(sm)->Submit(audio, n_samples);
}

// Fills request_ids (num_slots), copies each slot's audio into
// audio_out + slot*max_samples (zero-padded/truncated). Returns active count.
int wtpu_schedule(void* sm, int64_t* request_ids, float* audio_out,
                  int64_t max_samples) {
  auto* m = static_cast<wtpu::SlotManager*>(sm);
  std::vector<wtpu::SlotView> slots;
  int active = m->Schedule(&slots);
  for (size_t s = 0; s < slots.size(); ++s) {
    request_ids[s] = slots[s].request_id;
    float* dst = audio_out + s * max_samples;
    int64_t n = slots[s].n_samples < max_samples ? slots[s].n_samples
                                                 : max_samples;
    if (slots[s].audio && n > 0) std::memcpy(dst, slots[s].audio, n * 4);
    if (n < max_samples) std::memset(dst + n, 0, (max_samples - n) * 4);
  }
  return active;
}

void wtpu_complete(void* sm, int slot, const int32_t* tokens,
                   int64_t n_tokens) {
  static_cast<wtpu::SlotManager*>(sm)->Complete(slot, tokens, n_tokens);
}

// Returns token count (>=0) if ready, -1 otherwise.
int64_t wtpu_fetch(void* sm, int64_t request_id, int32_t* tokens,
                   int64_t capacity) {
  std::vector<int32_t> result;
  if (!static_cast<wtpu::SlotManager*>(sm)->Fetch(request_id, &result))
    return -1;
  int64_t n = static_cast<int64_t>(result.size());
  if (n > capacity) n = capacity;
  std::memcpy(tokens, result.data(), n * sizeof(int32_t));
  return n;
}

int64_t wtpu_pending(void* sm) {
  return static_cast<wtpu::SlotManager*>(sm)->pending();
}

}  // extern "C"

// ---- BatchScheduler ---------------------------------------------------------

#include "wtpu/scheduler.h"

#include <algorithm>

extern "C" {

void* wtpu_scheduler_new(const int* sizes, int n_sizes, int64_t max_wait_ms) {
  std::vector<int> allowed(sizes, sizes + n_sizes);
  std::sort(allowed.begin(), allowed.end());
  return new wtpu::BatchScheduler(std::move(allowed), max_wait_ms);
}

void wtpu_scheduler_free(void* s) {
  delete static_cast<wtpu::BatchScheduler*>(s);
}

void wtpu_scheduler_submit(void* s, int64_t request_id, int priority,
                           int64_t timeout_ms) {
  static_cast<wtpu::BatchScheduler*>(s)->Submit(request_id, priority,
                                                timeout_ms);
}

// Returns batch size; writes up to batch_cap ids and up to expired_cap
// expired ids (count into *n_expired).
int wtpu_scheduler_poll(void* s, int64_t* batch, int64_t batch_cap,
                        int64_t* expired, int64_t expired_cap,
                        int64_t* n_expired) {
  std::vector<int64_t> b, e;
  int n = static_cast<wtpu::BatchScheduler*>(s)->Poll(&b, &e);
  for (int64_t i = 0; i < static_cast<int64_t>(b.size()) && i < batch_cap; ++i)
    batch[i] = b[i];
  int64_t ne = static_cast<int64_t>(e.size());
  if (ne > expired_cap) ne = expired_cap;
  for (int64_t i = 0; i < ne; ++i) expired[i] = e[i];
  if (n_expired) *n_expired = ne;
  return n;
}

int wtpu_scheduler_flush(void* s, int64_t* batch, int64_t cap) {
  std::vector<int64_t> b;
  int n = static_cast<wtpu::BatchScheduler*>(s)->Flush(&b);
  for (int64_t i = 0; i < static_cast<int64_t>(b.size()) && i < cap; ++i)
    batch[i] = b[i];
  return n;
}

int64_t wtpu_scheduler_pending(void* s) {
  return static_cast<wtpu::BatchScheduler*>(s)->pending();
}

// out6: submitted, launched_batches, launched_requests, expired,
//       queue-delay p50 us, p95 us
void wtpu_scheduler_stats(void* s, int64_t* out6) {
  auto st = static_cast<wtpu::BatchScheduler*>(s)->stats();
  out6[0] = st.submitted;
  out6[1] = st.launched_batches;
  out6[2] = st.launched_requests;
  out6[3] = st.expired;
  if (st.delays_us.empty()) {
    out6[4] = out6[5] = 0;
    return;
  }
  std::vector<int64_t> d = st.delays_us;
  std::sort(d.begin(), d.end());
  out6[4] = d[d.size() / 2];
  out6[5] = d[static_cast<size_t>(d.size() * 0.95) < d.size()
                  ? static_cast<size_t>(d.size() * 0.95)
                  : d.size() - 1];
}

}  // extern "C"
