// Native unit tests (analog of reference: cpp/tests/ gtest suite, without
// the gtest dependency).

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <thread>
#include <vector>

#include "wtpu/scheduler.h"
#include "wtpu/slot_manager.h"
#include "wtpu/wav.h"

namespace {

std::vector<uint8_t> MakeWav(const std::vector<int16_t>& pcm, int rate,
                             int channels) {
  std::vector<uint8_t> wav(44 + pcm.size() * 2);
  uint32_t data_size = pcm.size() * 2;
  uint32_t riff_size = 36 + data_size;
  uint16_t block_align = channels * 2;
  uint32_t byte_rate = rate * block_align;
  std::memcpy(&wav[0], "RIFF", 4);
  std::memcpy(&wav[4], &riff_size, 4);
  std::memcpy(&wav[8], "WAVE", 4);
  std::memcpy(&wav[12], "fmt ", 4);
  uint32_t fmt_size = 16;
  std::memcpy(&wav[16], &fmt_size, 4);
  uint16_t fmt = 1, ch = channels, bits = 16;
  std::memcpy(&wav[20], &fmt, 2);
  std::memcpy(&wav[22], &ch, 2);
  uint32_t r = rate;
  std::memcpy(&wav[24], &r, 4);
  std::memcpy(&wav[28], &byte_rate, 4);
  std::memcpy(&wav[32], &block_align, 2);
  std::memcpy(&wav[34], &bits, 2);
  std::memcpy(&wav[36], "data", 4);
  std::memcpy(&wav[40], &data_size, 4);
  std::memcpy(&wav[44], pcm.data(), data_size);
  return wav;
}

void TestWavDecode() {
  std::vector<int16_t> pcm(1600);
  for (size_t i = 0; i < pcm.size(); ++i)
    pcm[i] = static_cast<int16_t>(16384 * std::sin(2 * M_PI * 440 * i / 16000.0));
  auto wav = MakeWav(pcm, 16000, 1);
  wtpu::AudioBuffer buf;
  assert(wtpu::DecodeWav(wav.data(), wav.size(), &buf));
  assert(buf.sample_rate == 16000);
  assert(buf.samples.size() == 1600);
  assert(std::fabs(buf.samples[0]) < 1e-6);
  std::printf("TestWavDecode OK\n");
}

void TestResample() {
  std::vector<float> in(8000, 1.0f);
  auto out = wtpu::Resample(in, 8000, 16000);
  assert(out.size() == 16000);
  for (float v : out) assert(std::fabs(v - 1.0f) < 1e-6);
  std::printf("TestResample OK\n");
}

void TestSlotManager() {
  wtpu::SlotManager sm(2);
  std::vector<float> a(100, 0.5f), b(50, 0.25f), c(10, 0.1f);
  int64_t ra = sm.Submit(a.data(), a.size());
  int64_t rb = sm.Submit(b.data(), b.size());
  int64_t rc = sm.Submit(c.data(), c.size());
  assert(sm.pending() == 3);

  std::vector<wtpu::SlotView> slots;
  int active = sm.Schedule(&slots);
  assert(active == 2);
  assert(slots[0].request_id == ra && slots[1].request_id == rb);
  assert(sm.pending() == 1);

  int32_t toks[3] = {1, 2, 3};
  sm.Complete(0, toks, 3);
  active = sm.Schedule(&slots);          // rc takes the freed slot
  assert(active == 2);
  assert(slots[0].request_id == rc);

  std::vector<int32_t> result;
  assert(sm.Fetch(ra, &result));
  assert(result.size() == 3 && result[2] == 3);
  assert(!sm.Fetch(rb, &result));        // not finished yet
  std::printf("TestSlotManager OK\n");
}

void TestBatchScheduler() {
  // allowed sizes {2, 4}, 50 ms tail guard
  wtpu::BatchScheduler sched({2, 4}, 50);
  std::vector<int64_t> batch, expired;

  // nothing pending -> nothing launches
  assert(sched.Poll(&batch, &expired) == 0);

  // 4 requests fill the largest allowed size immediately
  for (int i = 1; i <= 4; ++i) sched.Submit(i, /*priority=*/0, 0);
  assert(sched.Poll(&batch, &expired) == 4);
  assert(batch[0] == 1 && batch[3] == 4);

  // priority beats FIFO: 11 jumps ahead of 10
  sched.Submit(10, 0, 0);
  sched.Submit(11, 5, 0);
  sched.Submit(12, 0, 0);
  sched.Submit(13, 0, 0);
  assert(sched.Poll(&batch, &expired) == 4);
  assert(batch[0] == 11 && batch[1] == 10);

  // below max batch: waits for the tail guard, then launches the largest
  // allowed size <= pending
  sched.Submit(20, 0, 0);
  sched.Submit(21, 0, 0);
  sched.Submit(22, 0, 0);
  assert(sched.Poll(&batch, &expired) == 0);  // 3 pending, no wait yet
  std::this_thread::sleep_for(std::chrono::milliseconds(60));
  assert(sched.Poll(&batch, &expired) == 2);  // largest allowed <= 3
  assert(sched.pending() == 1);

  // deadline expiry
  sched.Submit(30, 0, /*timeout_ms=*/1);
  std::this_thread::sleep_for(std::chrono::milliseconds(5));
  sched.Poll(&batch, &expired);
  bool found = false;
  for (int64_t e : expired) found |= (e == 30);
  assert(found);

  // flush drains the remainder
  int n = sched.Flush(&batch);
  assert(n == 1 && batch[0] == 22);
  assert(sched.pending() == 0);

  auto st = sched.stats();
  assert(st.submitted == 12);
  assert(st.expired == 1);
  assert(st.launched_requests == 11);
  std::printf("TestBatchScheduler OK\n");
}

}  // namespace

int main() {
  TestWavDecode();
  TestResample();
  TestSlotManager();
  TestBatchScheduler();
  std::printf("all native tests passed\n");
  return 0;
}
