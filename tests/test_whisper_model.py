"""Numeric parity of the Whisper model vs HF torch on tiny random configs.

This is the reference's own test method: build the model from a tiny config,
load the same weights into the torch twin, assert allclose
(reference: tests/model/test_gpt.py:47-135; dev method README.md:140).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.models.whisper import (
    compute_cross_kv,
    convert_hf_model,
    decode_full,
    decode_step,
    encode,
    init_self_kv,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
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
        # silence generation-config warnings
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = convert_hf_model(hf)
    return hf, params, cfg


def _mel(rng, cfg, batch=2):
    # encoder input frames = 2 * max_source_positions (conv stride 2)
    return rng.standard_normal(
        (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)


def test_encoder_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    mel = _mel(rng, cfg)
    ours = np.asarray(jax.jit(lambda p, m: encode(p, cfg, m))(params, mel))
    with torch.no_grad():
        theirs = hf.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_decoder_teacher_forced_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    mel = _mel(rng, cfg)
    tokens = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int32)

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    ours = np.asarray(
        jax.jit(lambda p, t, e: decode_full(p, cfg, t, e))(params, tokens, enc)
    )
    with torch.no_grad():
        theirs = hf(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_decode_step_matches_teacher_forced(hf_pair, rng):
    """The incremental cached path must reproduce the full forward exactly —
    the self/cross × step-0/step-n matrix the reference got wrong once
    (reference: README.md:100-106)."""
    hf, params, cfg = hf_pair
    mel = _mel(rng, cfg)
    tokens = rng.integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    full_logits = np.asarray(
        jax.jit(lambda p, t, e: decode_full(p, cfg, t, e))(params, tokens, enc)
    )

    step_fn = jax.jit(
        lambda p, t, pos, sk, sv, ck, cv: decode_step(p, cfg, t, pos, sk, sv, ck, cv)
    )
    ck, cv = jax.jit(lambda p, e: compute_cross_kv(p, cfg, e))(params, enc)
    sk, sv = init_self_kv(cfg, batch=2)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, sk, sv = step_fn(
            params, jnp.asarray(tokens[:, i]), jnp.int32(i), sk, sv, ck, cv
        )
        step_logits.append(np.asarray(logits))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, atol=2e-5, rtol=1e-4)


def test_bf16_decode_runs(hf_pair, rng):
    """bf16 compute path with fp32 logits stays finite and close-ish."""
    from whisper_trtllm_tpu.models.whisper import cast_params

    hf, params, cfg = hf_pair
    mel = _mel(rng, cfg)
    tokens = rng.integers(0, cfg.vocab_size, (2, 5)).astype(np.int32)
    p16 = cast_params(params, jnp.bfloat16)
    enc = jax.jit(lambda p, m: encode(p, cfg, m))(p16, mel.astype(jnp.bfloat16))
    logits = jax.jit(lambda p, t, e: decode_full(p, cfg, t, e))(p16, tokens, enc)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_decode_chunk_matches_steps(hf_pair, rng):
    """Chunked (context-phase) decode == step-by-step decode exactly,
    including mid-sequence chunks over a warm cache."""
    from whisper_trtllm_tpu.models.whisper import decode_chunk, decode_step_kv

    hf, params, cfg = hf_pair
    mel = _mel(rng, cfg)
    tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    enc = encode(params, cfg, jnp.asarray(mel))
    ck, cv = compute_cross_kv(params, cfg, enc)

    # reference: pure step loop
    skv = init_self_kv(cfg, 2)
    step_logits = []
    for i in range(8):
        lg, skv = decode_step_kv(params, cfg, jnp.asarray(tokens[:, i]),
                                 jnp.int32(i), skv, (ck, cv))
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, 1)

    # chunked: 3 tokens stepwise, then a 5-token chunk
    skv2 = init_self_kv(cfg, 2)
    out = []
    for i in range(3):
        lg, skv2 = decode_step_kv(params, cfg, jnp.asarray(tokens[:, i]),
                                  jnp.int32(i), skv2, (ck, cv))
        out.append(np.asarray(lg)[:, None])
    lg, skv2 = decode_chunk(params, cfg, jnp.asarray(tokens[:, 3:]),
                            jnp.int32(3), skv2, (ck, cv))
    out.append(np.asarray(lg))
    chunk_logits = np.concatenate(out, axis=1)
    np.testing.assert_allclose(chunk_logits, step_logits, atol=2e-5, rtol=1e-4)
    # caches identical afterwards
    for a, b in zip(skv, skv2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_qkv_matches_unfused(hf_pair, rng):
    """fuse_qkv_params must be numerically identical end to end (the
    reference's fused-QKV layout, tensorrt_llm/layers/attention.py:48)."""
    from whisper_trtllm_tpu.models.whisper.model import fuse_qkv_params

    hf, params, cfg = hf_pair
    fused = fuse_qkv_params(params)
    assert "qkv" in fused["decoder"]["layers"]["self_attn"]
    mel = _mel(rng, cfg)
    tokens = rng.integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)
    enc_ref = encode(params, cfg, jnp.asarray(mel))
    enc_f = encode(fused, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(enc_f), np.asarray(enc_ref), atol=1e-6)
    ref = np.asarray(decode_full(params, cfg, tokens, enc_ref))
    out = np.asarray(decode_full(fused, cfg, tokens, enc_f))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.config import GenerationConfig

    g = GenerationConfig(max_new_tokens=8)
    t1, _ = transcribe_tokens(params, cfg, jnp.asarray(mel), g)
    t2, _ = transcribe_tokens(fused, cfg, jnp.asarray(mel), g)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
