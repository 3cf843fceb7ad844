"""Speculative decoding must reproduce the target's greedy output exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
from whisper_trtllm_tpu.runtime.speculative import speculative_transcribe_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig.testing()
    target = init_params(cfg, seed=0)
    draft = init_params(cfg, seed=1)   # a different (worse) model
    return cfg, target, draft


@pytest.mark.parametrize("gamma", [1, 3])
def test_spec_equals_target_greedy(setup, rng, gamma):
    cfg, target, draft = setup
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=12)

    ref_tokens, ref_lens = transcribe_tokens(target, cfg, jnp.asarray(mel), gen)
    ref = np.asarray(ref_tokens)[0][: int(np.asarray(ref_lens)[0])]

    spec_tokens, spec_len = speculative_transcribe_tokens(
        target, cfg, draft, cfg, jnp.asarray(mel), gen, gamma=gamma
    )
    spec = np.asarray(spec_tokens)[0][: int(spec_len)]

    # the spec loop stops gamma+1 short of max_len; compare the overlap
    n = min(len(ref), len(spec))
    assert n >= len(ref) - (gamma + 1)
    np.testing.assert_array_equal(spec[:n], ref[:n])


def test_spec_with_perfect_draft(setup, rng):
    """Draft == target → every proposal accepted; still exact."""
    cfg, target, _ = setup
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=12)
    ref_tokens, ref_lens = transcribe_tokens(target, cfg, jnp.asarray(mel), gen)
    ref = np.asarray(ref_tokens)[0][: int(np.asarray(ref_lens)[0])]
    spec_tokens, spec_len = speculative_transcribe_tokens(
        target, cfg, target, cfg, jnp.asarray(mel), gen, gamma=3
    )
    spec = np.asarray(spec_tokens)[0][: int(spec_len)]
    n = min(len(ref), len(spec))
    np.testing.assert_array_equal(spec[:n], ref[:n])
