// WAV/PCM decoding + resampling to 16 kHz mono float32.
//
// Native data-loader for the serving runtime — the role torchaudio's native
// decoder plays in the reference's dataset path (reference:
// examples/whisper/get_LibriSpeech.py:13-40), implemented dependency-free.

#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace wtpu {

struct AudioBuffer {
  std::vector<float> samples;  // mono float32 in [-1, 1]
  int sample_rate = 0;
};

// Parse a RIFF/WAVE blob (PCM16, PCM24, PCM32, IEEE float32). Multi-channel
// input is averaged to mono. Returns false on malformed input.
bool DecodeWav(const uint8_t* data, size_t size, AudioBuffer* out);

// Linear-interpolation resample.
std::vector<float> Resample(const std::vector<float>& in, int from_rate,
                            int to_rate);

// Decode + resample to target_rate (default 16 kHz).
bool LoadWav16k(const uint8_t* data, size_t size, std::vector<float>* out,
                int target_rate = 16000);

}  // namespace wtpu
