"""LLaMA zoo model parity vs HF on tiny random configs with grouped-query
attention (analog of reference: tests/model/test_llama.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.models.llama import convert_hf_llama, forward, generate


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=89, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rms_norm_eps=1e-6,
        eos_token_id=2, bos_token_id=1, attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    params, cfg = convert_hf_llama(hf)
    assert cfg.n_kv_head == 2
    return hf, params, cfg


def test_forward_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_generate_matches_hf(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=10, do_sample=False,
            pad_token_id=cfg.eos_token_id,
        ).numpy()
    ours = np.asarray(generate(params, cfg, jnp.asarray(prompt), 10))
    np.testing.assert_array_equal(ours[:, : theirs.shape[1]], theirs)


def test_generate_ragged_matches_per_row(hf_pair, rng):
    """Per-row input-lengths generation (per-lane RoPE angles + cache
    offsets) equals independent single-row generate — the reference's
    GenerationSession.decode(input_lengths) path for the LLaMA family."""
    from whisper_trtllm_tpu.models.llama import generate_ragged

    hf, params, cfg = hf_pair
    lens = np.array([2, 4], np.int32)
    pad = int(lens.max())
    new = 5
    prompt = rng.integers(3, cfg.vocab_size, (2, pad)).astype(np.int32)
    prompt[0, 2:] = 9           # right-pad garbage must not matter

    batched = np.asarray(
        generate_ragged(params, cfg, prompt, lens, max_new_tokens=new))
    for b, l in enumerate(lens):
        single = np.asarray(
            generate(params, cfg, jnp.asarray(prompt[b : b + 1, :l]), new))[0]
        np.testing.assert_array_equal(batched[b, :l], prompt[b, :l])
        np.testing.assert_array_equal(batched[b, l : l + new],
                                      single[l : l + new])
