"""Greedy-decode parity vs HF torch ``generate`` on tiny random models —
the analog of the reference's exact-transcript differential test
(reference: examples/whisper/run.py:294-331)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import convert_hf_model, encode
from whisper_trtllm_tpu.runtime.generation import greedy_decode, transcribe_tokens


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=97,
        num_mel_bins=16,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=24,
        max_target_positions=16,
        decoder_start_token_id=1,
        eos_token_id=2,
        pad_token_id=2,
        bos_token_id=1,
        suppress_tokens=[5, 7],
        begin_suppress_tokens=[3],
        forced_decoder_ids=[[1, 11]],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    # generation config mirrors model config (HF reads these from there)
    hf.generation_config.suppress_tokens = [5, 7]
    hf.generation_config.begin_suppress_tokens = [3]
    hf.generation_config.forced_decoder_ids = [[1, 11]]
    params, cfg = convert_hf_model(hf)
    assert cfg.suppress_tokens == (5, 7)
    assert cfg.forced_decoder_ids == ((1, 11),)
    return hf, params, cfg


def test_greedy_matches_hf_generate(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    # HF counts the [start, forced] prompt (len 2) against max_target_positions
    max_new = cfg.max_target_positions - 2
    with torch.no_grad():
        theirs = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=max_new,
            num_beams=1,
            do_sample=False,
        ).numpy()

    tokens, lengths = transcribe_tokens(
        params, cfg, jnp.asarray(mel), GenerationConfig(max_new_tokens=max_new)
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    for b in range(mel.shape[0]):
        ours_b = tokens[b, : lengths[b]]
        # modern HF whisper generate strips the decoder_start prompt token
        if theirs[b][0] != cfg.decoder_start_token_id:
            ours_b = ours_b[1:]
        theirs_b = theirs[b]
        # HF pads its batch output with pad_token after EOS; strip both
        if (theirs_b == cfg.eos_token_id).any():
            theirs_b = theirs_b[: np.argmax(theirs_b == cfg.eos_token_id) + 1]
        np.testing.assert_array_equal(ours_b, theirs_b)


def test_forced_and_suppressed_tokens(hf_pair, rng):
    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = transcribe_tokens(params, cfg, jnp.asarray(mel))
    tokens = np.asarray(tokens)
    assert (tokens[:, 0] == cfg.decoder_start_token_id).all()
    assert (tokens[:, 1] == 11).all()  # forced at position 1
    for t in cfg.suppress_tokens:     # never emitted
        assert not (tokens == t).any()


def test_eos_lanes_finish_independently(hf_pair, rng):
    """After EOS a lane must emit pad only (reference EOS masking,
    examples/whisper/run.py:205-217)."""
    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (4, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = transcribe_tokens(params, cfg, jnp.asarray(mel))
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    for b in range(4):
        after = tokens[b, lengths[b]:]
        assert (after == cfg.pad_token_id).all()


def test_detect_language_restricted_to_candidates(hf_pair, rng):
    from whisper_trtllm_tpu.models.whisper import encode
    from whisper_trtllm_tpu.runtime.generation import detect_language

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    enc = encode(params, cfg, jnp.asarray(mel))
    candidates = [20, 21, 22, 23]
    langs = np.asarray(detect_language(params, cfg, enc, candidates))
    assert langs.shape == (3,)
    assert all(int(t) in candidates for t in langs)


def test_prompted_greedy_matches_hf_decoder_input_ids(hf_pair, rng):
    """Seeding with a decoder prompt must match HF generate(decoder_input_ids=...)."""
    import torch

    from whisper_trtllm_tpu.models.whisper import encode
    from whisper_trtllm_tpu.runtime.generation import greedy_decode_prompted

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    prompt = np.asarray(
        [[cfg.decoder_start_token_id, 11, 13],
         [cfg.decoder_start_token_id, 11, 17]], np.int32)

    with torch.no_grad():
        theirs = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=8, do_sample=False,
        ).numpy()

    enc = encode(params, cfg, jnp.asarray(mel))
    tokens, lengths = greedy_decode_prompted(
        params, cfg, enc, prompt, GenerationConfig(max_new_tokens=8)
    )
    tokens = np.asarray(tokens)
    # our buffer holds [prompt | generated]; HF returns only the generated
    # continuation here — compare that region
    p = prompt.shape[1]
    for b in range(2):
        ours_gen = tokens[b, p:]
        theirs_b = theirs[b]
        if (theirs_b == cfg.eos_token_id).any():
            theirs_b = theirs_b[: np.argmax(theirs_b == cfg.eos_token_id) + 1]
        n = min(len(theirs_b), len(ours_gen))
        np.testing.assert_array_equal(ours_gen[:n], theirs_b[:n])
        # the prompt itself is preserved verbatim
        np.testing.assert_array_equal(tokens[b, :p], prompt[b])


def test_cross_kv_layout_invariance():
    """greedy int8-KV decode is token-identical whichever cross-KV layout
    is used ("auto" resolves to T-minor for quantized caches); float path
    forced to bhdt must match the default bhtd too."""
    import dataclasses

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)) * 0.5,
        jnp.float32)
    enc = wmodel.encode(params, cfg, mel)

    for dtype in ("int8", "fp8"):
        base = GenerationConfig(max_new_tokens=12, kv_cache_dtype=dtype)
        t_auto, l_auto = greedy_decode(params, cfg, enc, base)
        t_ref, l_ref = greedy_decode(
            params, cfg, enc,
            dataclasses.replace(base, cross_kv_layout="bhtd"))
        np.testing.assert_array_equal(np.asarray(t_auto), np.asarray(t_ref))
        np.testing.assert_array_equal(np.asarray(l_auto), np.asarray(l_ref))

    base = GenerationConfig(max_new_tokens=12)
    t_d, l_d = greedy_decode(params, cfg, enc, base)
    t_t, l_t = greedy_decode(
        params, cfg, enc, dataclasses.replace(base, cross_kv_layout="bhdt"))
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_t))
    np.testing.assert_array_equal(np.asarray(l_d), np.asarray(l_t))


def test_cross_kv_layout_square_cache_guard():
    """When the padded encoder length equals head_dim the T-minor layout is
    shape-undetectable (ADVICE r3): explicit bhdt must refuse instead of
    silently corrupting attention; 'auto' must fall back to the default
    layout and still decode identically to bhtd."""
    import dataclasses

    import pytest

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    # d_model 32 / 4 heads -> dh=8; max_source_positions=8 -> Tc=8 == dh
    cfg = WhisperConfig.testing(max_source_positions=8)
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)) * 0.5,
        jnp.float32)
    enc = wmodel.encode(params, cfg, mel)
    assert enc.shape[1] == cfg.decoder_head_dim  # the ambiguous geometry

    gen8 = GenerationConfig(max_new_tokens=6, kv_cache_dtype="int8")
    with pytest.raises(ValueError, match="bhdt"):
        greedy_decode(params, cfg, enc,
                      dataclasses.replace(gen8, cross_kv_layout="bhdt"))

    t_auto, l_auto = greedy_decode(params, cfg, enc, gen8)  # auto: no-op
    t_ref, l_ref = greedy_decode(
        params, cfg, enc, dataclasses.replace(gen8, cross_kv_layout="bhtd"))
    np.testing.assert_array_equal(np.asarray(t_auto), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(l_auto), np.asarray(l_ref))
