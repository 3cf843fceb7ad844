"""Timestamp logits rules vs HF's WhisperTimeStampLogitsProcessor, on
random logits + synthetic token histories covering every branch."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.runtime.logits_process import apply_timestamp_rules


VOCAB = 60
TS_BEGIN = 40          # timestamp tokens are [40, 60)
NO_TS = TS_BEGIN - 1   # 39
EOS = 2
BEGIN_INDEX = 2        # [start, lang] prompt
MAX_INITIAL = 5


def _hf_processor():
    import torch
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    class GC:
        no_timestamps_token_id = NO_TS
        eos_token_id = EOS
        bos_token_id = 1
        max_initial_timestamp_index = MAX_INITIAL

    return WhisperTimeStampLogitsProcessor(GC(), begin_index=BEGIN_INDEX)


def _compare(tokens_hist: np.ndarray, rng):
    """tokens_hist: (B, L) the generated-so-far buffer (prompt included)."""
    import torch

    proc = _hf_processor()
    b, cur = tokens_hist.shape
    logits = rng.standard_normal((b, VOCAB)).astype(np.float32)

    theirs = proc(
        torch.from_numpy(tokens_hist.astype(np.int64)),
        torch.from_numpy(logits.copy()),
    ).numpy()

    # our buffer is fixed-size with pos pointing at the last filled index
    max_len = cur + 4
    buf = np.zeros((b, max_len), np.int32)
    buf[:, :cur] = tokens_hist
    ours = np.asarray(
        apply_timestamp_rules(
            jnp.asarray(logits), jnp.asarray(buf), jnp.int32(cur - 1),
            BEGIN_INDEX, TS_BEGIN, EOS, MAX_INITIAL,
        )
    )
    # compare masks and surviving values
    np.testing.assert_allclose(
        np.where(np.isneginf(theirs), -1.0, theirs),
        np.where(np.isneginf(ours), -1.0, ours),
        atol=1e-5,
    )


def test_at_begin(rng):
    # generating the first free position: timestamps only, bounded initial
    _compare(np.asarray([[1, 3]], np.int32), rng)


def test_after_text(rng):
    _compare(np.asarray([[1, 3, 41, 10, 11]], np.int32), rng)


def test_after_single_timestamp(rng):
    # last is timestamp, penultimate is text → must continue with ts/eos
    _compare(np.asarray([[1, 3, 41, 10, 45]], np.int32), rng)


def test_after_timestamp_pair(rng):
    # last two are timestamps → must be text
    _compare(np.asarray([[1, 3, 41, 10, 45, 45]], np.int32), rng)


def test_first_generated_is_timestamp(rng):
    # seq == [ts]: last ts, "penultimate" counts as ts (len<2) → force text
    _compare(np.asarray([[1, 3, 42]], np.int32), rng)


def test_monotonicity_batch(rng):
    # mixed batch exercising different floors
    hist = np.asarray(
        [[1, 3, 41, 10, 45, 45, 12],
         [1, 3, 44, 44, 50, 50, 13],
         [1, 3, 40, 7, 8, 9, 10]], np.int32)
    _compare(hist, rng)


def test_greedy_with_timestamps_runs(rng):
    """End-to-end greedy with timestamp rules on a tiny random model."""
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens

    cfg = WhisperConfig.testing(
        vocab_size=64,
        forced_decoder_ids=(),
        suppress_tokens=(),
        begin_suppress_tokens=(),
        no_timestamps_token_id=39,
        max_initial_timestamp_index=5,
    )
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = transcribe_tokens(
        params, cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=10, return_timestamps=True),
    )
    tokens = np.asarray(tokens)
    # first generated token must be a timestamp within the initial bound
    assert (tokens[:, 1] >= 40).all() and (tokens[:, 1] <= 45).all()
    # notimestamps token never appears
    assert not (tokens == 39).any()


def test_forced_map_strips_notimestamps_when_timestamps_requested():
    """HF removes the forced <|notimestamps|> id when return_timestamps=True
    — conditioning on no-timestamps while forcing timestamp tokens would be
    contradictory (the .en presets pin forced_decoder_ids=((1, 50362),))."""
    from whisper_trtllm_tpu.config import WhisperConfig
    from whisper_trtllm_tpu.runtime.logits_process import build_forced_map

    cfg = WhisperConfig.tiny_en()
    arr, begin = build_forced_map(cfg, 16)
    assert arr[1] == cfg.no_timestamps_token_id and begin == 2
    arr_ts, begin_ts = build_forced_map(cfg, 16, timestamps=True)
    assert (arr_ts == -1).all() and begin_ts == 1
