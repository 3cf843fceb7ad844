"""Debug API tests (analog of reference: tests/test_debugging_api.py,
tests/test_session.py debug-output pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import encode, init_params
from whisper_trtllm_tpu.utils.debugging import checked, encode_with_intermediates


def test_intermediates_match_plain_encode(rng):
    cfg = WhisperConfig.testing()
    params = init_params(cfg, 0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    final, inter = jax.jit(
        lambda p, m: encode_with_intermediates(p, cfg, m)
    )(params, mel)
    ref = encode(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(final), np.asarray(ref), atol=1e-6)
    assert inter["layer_outputs"].shape[0] == cfg.encoder_layers
    assert inter["conv_stem"].shape == (2, cfg.max_source_positions, cfg.d_model)


def test_checked_catches_nan():
    f = checked(lambda x: jnp.log(x))
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray([1.0]))), [0.0])


def test_session_refit(rng):
    from whisper_trtllm_tpu.runtime import WhisperSession

    cfg = WhisperConfig.testing()
    sess = WhisperSession(init_params(cfg, 0), cfg, GenerationConfig(max_new_tokens=4))
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    t1, _ = sess.transcribe_features(mel)
    sess.refit(init_params(cfg, 1))
    t2, _ = sess.transcribe_features(mel)
    assert not np.array_equal(t1, t2)
