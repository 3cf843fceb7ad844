"""Golden test: our JAX log-mel frontend vs the HF extractor the reference
uses (reference: examples/whisper/run.py:267;
transformers/src/transformers/models/whisper/feature_extraction_whisper.py:94-111)."""

import numpy as np
import pytest

from whisper_trtllm_tpu.audio import (
    LogMelSpectrogram,
    log_mel_spectrogram,
    mel_filter_bank,
    pad_or_trim,
    N_SAMPLES,
)


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_filter_bank(201, 80)
    theirs = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


@pytest.mark.parametrize("num_mel_bins", [80, 128])
def test_log_mel_matches_hf_extractor(rng, num_mel_bins):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=num_mel_bins)
    # synthetic speech-ish signal: mixture of tones + noise, shorter than 30 s
    t = np.arange(7 * 16000) / 16000.0
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)

    theirs = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(
        log_mel_spectrogram(pad_or_trim(audio)[None], num_mel_bins=num_mel_bins)[0]
    ).T  # ours is (T, M); HF is (M, T)

    assert theirs.shape == ours.shape == (num_mel_bins, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_pad_or_trim():
    x = np.ones(100, np.float32)
    assert pad_or_trim(x).shape == (N_SAMPLES,)
    assert pad_or_trim(np.ones(N_SAMPLES + 5, np.float32)).shape == (N_SAMPLES,)
    y = pad_or_trim(x)
    assert y[:100].sum() == 100 and y[100:].sum() == 0


def test_batched_frontend(rng):
    audio = rng.standard_normal((2, N_SAMPLES)).astype(np.float32)
    out = log_mel_spectrogram(audio)
    assert out.shape == (2, 3000, 80)
    # per-utterance max normalization must be independent across the batch
    one = log_mel_spectrogram(audio[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one[0]), atol=1e-6)
