"""Log-mel spectrogram frontend, on-device in JAX.

Replaces the reference's host-side numpy STFT preprocessing
(reference: transformers/src/transformers/models/whisper/
feature_extraction_whisper.py:94-111 and examples/whisper/run.py:267): the
audio is reshaped into hop-sized (160) blocks and each 400-sample analysis
frame is three consecutive blocks (480 samples, window zero-padded), so the
windowed DFT becomes one large (frames, 480) @ (480, 2*201) MXU matmul plus
the mel-filterbank matmul — the whole frontend runs on the MXU inside one
jit, with no framing gather, no small-channel conv, and no host round-trip
before the encoder. (A stride-160 conv1d formulation lowers ~20x slower on
v5e because in_channels=1 convs miss the MXU.)

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
        # fold the window into the DFT bases, zero-pad the 400-tap analysis
        # to 3 hop blocks (480), and fuse real/imag into ONE (480, 402) basis
        wcos = window[:, None] * cos_m
        wsin = window[:, None] * sin_m
        basis = np.zeros((3 * HOP_LENGTH, 2 * N_FREQ_BINS), np.float32)
        basis[:N_FFT, :N_FREQ_BINS] = wcos
        basis[:N_FFT, N_FREQ_BINS:] = wsin
        self.dft_basis = jnp.asarray(basis)                      # (480, 402)
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
        # frame f covers samples [160f, 160f+480): three consecutive
        # hop-blocks. Tail-pad so block f+2 exists for the last frame.
        n_frames_full = N_FRAMES + 1                              # 3001
        total = (n_frames_full + 2) * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, total - padded.shape[1])))
        blocks = padded.reshape(b, n_frames_full + 2, HOP_LENGTH)

        import os

        from whisper_trtllm_tpu.ops.pallas import pallas_enabled

        if os.environ.get("WHISPER_TPU_PALLAS_STFT") == "1" and pallas_enabled():
            # fused Pallas kernel: DMA + DFT + power + mel + log per frame
            # block; the power spectrogram never touches HBM. Opt-in: the
            # jnp block-matmul path below is already MXU-bound and fast.
            from whisper_trtllm_tpu.ops.pallas.stft import stft_log_mel

            log_spec = stft_log_mel(blocks, self.dft_basis, self.mel_fb)
        else:
            frames = jnp.concatenate(
                [blocks[:, :-2], blocks[:, 1:-1], blocks[:, 2:]], axis=-1
            )                                                     # (B, 3001, 480)
            spec = jnp.einsum(
                "btn,nf->btf", frames, self.dft_basis, precision=_HIGHEST
            )                                                     # (B, 3001, 402)
            real = spec[..., :N_FREQ_BINS]
            imag = spec[..., N_FREQ_BINS:]
            power = real * real + imag * imag                     # (B, 3001, 201)
            melspec = jnp.einsum(
                "btf,fm->btm", power, self.mel_fb, precision=_HIGHEST
            )
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
