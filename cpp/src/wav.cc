#include "wtpu/wav.h"

#include <cstring>

namespace wtpu {
namespace {

uint32_t ReadU32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

uint16_t ReadU16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

}  // namespace

bool DecodeWav(const uint8_t* data, size_t size, AudioBuffer* out) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_size = 0;

  size_t pos = 12;
  while (pos + 8 <= size) {
    const uint8_t* chunk = data + pos;
    uint32_t chunk_size = ReadU32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16 &&
        pos + 8 + 16 <= size) {
      format = ReadU16(chunk + 8);
      channels = ReadU16(chunk + 10);
      sample_rate = ReadU32(chunk + 12);
      bits = ReadU16(chunk + 22);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      pcm = chunk + 8;
      pcm_size = chunk_size;
      if (pos + 8 + pcm_size > size) pcm_size = size - pos - 8;
    }
    pos += 8 + chunk_size + (chunk_size & 1);  // chunks are 2-byte aligned
  }
  // format 1 = PCM, 3 = IEEE float; (0xFFFE extensible unsupported)
  if (!pcm || channels == 0 || sample_rate == 0 ||
      (format != 1 && format != 3)) {
    return false;
  }
  size_t bytes_per_sample = bits / 8;
  if (bytes_per_sample == 0) return false;
  size_t frames = pcm_size / (bytes_per_sample * channels);

  out->samples.resize(frames);
  out->sample_rate = static_cast<int>(sample_rate);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* sp = pcm + (i * channels + c) * bytes_per_sample;
      double s = 0.0;
      if (format == 3 && bits == 32) {
        float f;
        std::memcpy(&f, sp, 4);
        s = f;
      } else if (bits == 16) {
        int16_t v;
        std::memcpy(&v, sp, 2);
        s = v / 32768.0;
      } else if (bits == 32) {
        int32_t v;
        std::memcpy(&v, sp, 4);
        s = v / 2147483648.0;
      } else if (bits == 24) {
        int32_t v = (sp[0] << 8) | (sp[1] << 16) | (sp[2] << 24);
        s = (v >> 8) / 8388608.0;
      } else if (bits == 8) {
        s = (sp[0] - 128) / 128.0;
      } else {
        return false;
      }
      acc += s;
    }
    out->samples[i] = static_cast<float>(acc / channels);
  }
  return true;
}

std::vector<float> Resample(const std::vector<float>& in, int from_rate,
                            int to_rate) {
  if (from_rate == to_rate || in.empty()) return in;
  size_t out_len = static_cast<size_t>(
      static_cast<double>(in.size()) * to_rate / from_rate);
  std::vector<float> out(out_len);
  double step = static_cast<double>(from_rate) / to_rate;
  for (size_t i = 0; i < out_len; ++i) {
    double src = i * step;
    size_t i0 = static_cast<size_t>(src);
    size_t i1 = i0 + 1 < in.size() ? i0 + 1 : in.size() - 1;
    double frac = src - i0;
    out[i] = static_cast<float>(in[i0] * (1.0 - frac) + in[i1] * frac);
  }
  return out;
}

bool LoadWav16k(const uint8_t* data, size_t size, std::vector<float>* out,
                int target_rate) {
  AudioBuffer buf;
  if (!DecodeWav(data, size, &buf)) return false;
  *out = Resample(buf.samples, buf.sample_rate, target_rate);
  return true;
}

}  // namespace wtpu
