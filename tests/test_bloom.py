"""Bloom zoo model parity vs HF (ALiBi, embedding LN, interleaved fused QKV)
(analog of reference: tests/model/test_bloom.py)."""

import jax
import numpy as np
import pytest

from whisper_trtllm_tpu.models.bloom import convert_hf_bloom, forward, generate


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import BloomConfig as HFConfig
    from transformers import BloomForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=89, hidden_size=32, n_layer=2, n_head=4,
        eos_token_id=2, bos_token_id=1,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    hf = BloomForCausalLM(hf_cfg).eval()
    params, cfg = convert_hf_bloom(hf)
    return hf, params, cfg


def test_forward_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_greedy_continuation_matches_hf(hf_pair, rng):
    """Greedy next-token over a few steps via teacher-forced re-scoring."""
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(3, cfg.vocab_size, (1, 4)).astype(np.int32)
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(tokens.astype(np.int64)),
            max_new_tokens=6, do_sample=False, pad_token_id=cfg.eos_token_id,
        ).numpy()
    seq = tokens
    for _ in range(6):
        logits = np.asarray(forward(params, cfg, seq))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(seq, theirs[:, : seq.shape[1]])


def test_cached_generate_matches_hf(hf_pair, rng):
    """Cached prefill+step generation (ALiBi bias in the decode-step kernel)
    is token-exact vs HF greedy generate (the reference runs Bloom through
    GenerationSession the same way, reference: examples/bloom/run.py)."""
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(3, cfg.vocab_size, (2, 5)).astype(np.int32)
    new = 7
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(tokens.astype(np.int64)),
            max_new_tokens=new, do_sample=False, pad_token_id=cfg.eos_token_id,
        ).numpy()
    ours = np.asarray(generate(params, cfg, tokens, max_new_tokens=new))
    # compare up to each row's EOS (HF pads with eos after finish, as do we)
    np.testing.assert_array_equal(ours, theirs)
