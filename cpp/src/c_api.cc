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
