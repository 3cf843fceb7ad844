// Standalone C++ client of the native runtime library (libwtpu).
//
// Analog of the reference's examples/cpp_library/ (loading
// libnvinfer_plugin_tensorrt_llm.so from a C++ app, main.cpp): here the
// native pieces are ordinary C++ classes — WAV decode/resample, the slot
// manager, and the batch scheduler — usable from any C++ service that
// owns the ingest path while Python/JAX owns the device.
//
// Build (wired as the `wtpu_client_example` target): cd cpp && cmake -B
// build -G Ninja && ninja -C build && ./build/wtpu_client_example

#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

#include "wtpu/scheduler.h"
#include "wtpu/slot_manager.h"
#include "wtpu/wav.h"

int main() {
  // synthesize a 1 s 440 Hz WAV at 8 kHz and decode+resample it to 16 kHz
  std::vector<int16_t> pcm(8000);
  for (size_t i = 0; i < pcm.size(); ++i)
    pcm[i] = static_cast<int16_t>(
        12000 * std::sin(2 * M_PI * 440 * i / 8000.0));
  std::vector<uint8_t> wav(44 + pcm.size() * 2);
  uint32_t data_size = pcm.size() * 2, riff = 36 + data_size, fmt = 16;
  uint32_t rate = 8000, byte_rate = rate * 2;
  uint16_t one = 1, ch = 1, align = 2, bits = 16;
  std::memcpy(&wav[0], "RIFF", 4);  std::memcpy(&wav[4], &riff, 4);
  std::memcpy(&wav[8], "WAVE", 4);  std::memcpy(&wav[12], "fmt ", 4);
  std::memcpy(&wav[16], &fmt, 4);   std::memcpy(&wav[20], &one, 2);
  std::memcpy(&wav[22], &ch, 2);    std::memcpy(&wav[24], &rate, 4);
  std::memcpy(&wav[28], &byte_rate, 4); std::memcpy(&wav[32], &align, 2);
  std::memcpy(&wav[34], &bits, 2);  std::memcpy(&wav[36], "data", 4);
  std::memcpy(&wav[40], &data_size, 4);
  std::memcpy(&wav[44], pcm.data(), data_size);

  std::vector<float> samples;
  if (!wtpu::LoadWav16k(wav.data(), wav.size(), &samples)) {
    std::fprintf(stderr, "wav decode failed\n");
    return 1;
  }
  std::printf("decoded+resampled: %zu samples @16k\n", samples.size());

  // queue three requests through the policy scheduler, one prioritized
  wtpu::BatchScheduler sched({1, 2, 4}, /*max_wait_ms=*/5);
  sched.Submit(101, /*priority=*/0, /*timeout_ms=*/0);
  sched.Submit(102, /*priority=*/7, 0);
  sched.Submit(103, 0, 0);
  std::vector<int64_t> batch, expired, first;
  while (sched.pending() > 0) {
    sched.Poll(&batch, &expired);
    if (first.empty() && !batch.empty()) first = batch;
  }
  std::printf("first launch: %zu requests, id %lld first (priority wins)\n",
              first.size(), static_cast<long long>(first[0]));

  // slot manager: lane binding + result fetch
  wtpu::SlotManager slots(2);
  int64_t rid = slots.Submit(samples.data(), samples.size());
  std::vector<wtpu::SlotView> views;
  slots.Schedule(&views);
  int32_t toks[3] = {50257, 50362, 50256};
  slots.Complete(0, toks, 3);
  std::vector<int32_t> out;
  slots.Fetch(rid, &out);
  std::printf("slot round-trip tokens: %d %d %d\n", out[0], out[1], out[2]);
  std::printf("cpp client example OK\n");
  return 0;
}
