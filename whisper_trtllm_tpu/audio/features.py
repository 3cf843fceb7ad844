"""Log-mel spectrogram frontend, on-device in JAX.

Replaces the reference's host-side numpy STFT preprocessing
(reference: transformers/src/transformers/models/whisper/
feature_extraction_whisper.py:94-111 and examples/whisper/run.py:267): the
windowed STFT is expressed as a strided convolution — the windowed cos/sin
DFT bases are conv filters (kernel 400, stride 160, 201 channels) — plus a
mel-filterbank matmul, so the whole frontend runs on the MXU inside one jit,
with no framing gather and no host round-trip before the encoder.

Semantics matched exactly (tests/test_features.py):
  hann(400, periodic) window, hop 160, reflect center-pad 200,
  power spectrum, slaney mel (80 or 128 bins), log10 with 1e-10 floor,
  drop last frame, clamp to global max - 8, (x + 4) / 4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.audio import mel as _mel

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE      # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH          # 3000
N_FREQ_BINS = N_FFT // 2 + 1                # 201

_HIGHEST = jax.lax.Precision.HIGHEST


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Pad with zeros / trim to exactly ``length`` samples along the last axis
    (reference: examples/whisper/get_LibriSpeech.py:26 uses whisper.pad_or_trim)."""
    audio = np.asarray(audio)
    if audio.shape[-1] > length:
        audio = audio[..., :length]
    elif audio.shape[-1] < length:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
        audio = np.pad(audio, pad)
    return audio


class LogMelSpectrogram:
    """Precomputes the window/DFT/mel constants once; ``__call__`` is jittable.

    Output layout is ``(batch, n_frames, num_mel_bins)`` = (B, 3000, 80) —
    time-major, which is what the encoder conv stem consumes directly (the
    reference keeps HF's (B, 80, 3000) and permutes inside the graph,
    reference: tensorrt_llm/models/whisper/model.py:96-100).
    """

    def jit(self):
        """Cached jitted callable (a fresh ``jax.jit`` wrapper per call would
        retrace every time)."""
        if self._jitted is None:
            self._jitted = jax.jit(self.__call__)
        return self._jitted

    def __init__(self, num_mel_bins: int = 80, dtype=jnp.float32):
        self._jitted = None
        window = _mel.hann_window(N_FFT, periodic=True)          # (400,)
        cos_m, sin_m = _mel.dft_matrices(N_FFT)                  # (400, 201)
        # fold the window into the DFT bases and lay them out as conv filters
        # (kernel, in_channels=1, out_channels): the STFT is then one strided
        # convolution per real/imag part.
        self.cos_filt = jnp.asarray(
            (window[:, None] * cos_m)[:, None, :], dtype=jnp.float32
        )
        self.sin_filt = jnp.asarray(
            (window[:, None] * sin_m)[:, None, :], dtype=jnp.float32
        )
        self.mel_fb = jnp.asarray(
            _mel.mel_filter_bank(N_FREQ_BINS, num_mel_bins), dtype=jnp.float32
        )                                                        # (201, M)
        self.num_mel_bins = num_mel_bins
        self.dtype = dtype

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio: (B, N_SAMPLES) float32 → (B, N_FRAMES, M) log-mel."""
        if audio.ndim == 1:
            audio = audio[None]
        audio = audio.astype(jnp.float32)
        b = audio.shape[0]
        # center=True reflect padding of n_fft//2 on both sides
        padded = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
        x = padded[:, :, None]                                    # (B, T, 1)

        def stft_conv(filt):
            return jax.lax.conv_general_dilated(
                x,
                filt,
                window_strides=(HOP_LENGTH,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                precision=_HIGHEST,
            )

        real = stft_conv(self.cos_filt)                           # (B, 3001, 201)
        imag = stft_conv(self.sin_filt)
        power = real * real + imag * imag                         # (B, 3001, 201)
        melspec = jnp.einsum("btf,fm->btm", power, self.mel_fb, precision=_HIGHEST)
        log_spec = jnp.log10(jnp.maximum(melspec, 1e-10))
        log_spec = log_spec[:, :-1, :]                            # (B, 3000, M)
        gmax = jnp.max(log_spec.reshape(b, -1), axis=-1)          # per-utterance max
        log_spec = jnp.maximum(log_spec, gmax[:, None, None] - 8.0)
        log_spec = (log_spec + 4.0) / 4.0
        return log_spec.astype(self.dtype)


@functools.lru_cache(maxsize=4)
def _cached_frontend(num_mel_bins: int) -> LogMelSpectrogram:
    return LogMelSpectrogram(num_mel_bins)


def log_mel_spectrogram(audio, num_mel_bins: int = 80) -> jnp.ndarray:
    """Convenience one-shot API: numpy/JAX audio (B, 480000) or (480000,) →
    (B, 3000, M) device array."""
    fe = _cached_frontend(num_mel_bins)
    audio = jnp.asarray(audio)
    return fe.jit()(audio if audio.ndim == 2 else audio[None])
