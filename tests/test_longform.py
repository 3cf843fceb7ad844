"""Long-form chunked streaming tests."""

import numpy as np

from whisper_trtllm_tpu.runtime.longform import chunk_audio


def test_chunking_exact():
    audio = np.ones(480000 * 2 + 1000, np.float32)
    chunks = chunk_audio(audio)
    assert chunks.shape == (3, 480000)
    assert chunks[0].sum() == 480000
    assert chunks[2][:1000].sum() == 1000 and chunks[2][1000:].sum() == 0


def test_chunking_short():
    chunks = chunk_audio(np.ones(100, np.float32))
    assert chunks.shape == (1, 480000)


def test_chunking_overlap():
    audio = np.arange(480000 + 240000, dtype=np.float32)
    chunks = chunk_audio(audio, overlap_seconds=15.0)
    # stride = 15 s → starts at 0, 240000, 480000
    assert chunks.shape[0] == 3
    assert chunks[1][0] == 240000.0


def test_conditioned_longform_mechanism(rng):
    """Conditioned chunks seed the decoder with the previous chunk's text
    through a fixed-size prompt window; flow runs and yields per-chunk ids."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.runtime.longform import _conditioned_over_features

    cfg = WhisperConfig.testing()
    sess = WhisperSession(init_params(cfg, 0), cfg,
                          GenerationConfig(max_new_tokens=10))
    mels = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    outs, n = _conditioned_over_features(
        sess, mels, prev_sot_token_id=4, prev_context_tokens=3
    )
    assert n == 3 and len(outs) == 3
    for ids in outs:
        assert all(int(t) not in (cfg.eos_token_id, cfg.pad_token_id, 4)
                   for t in ids)
