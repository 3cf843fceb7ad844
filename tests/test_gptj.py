"""GPT-J zoo model parity vs HF (interleaved partial RoPE, parallel
attention+MLP residual) (analog of reference: tensorrt_llm/models/gptj)."""

import jax
import numpy as np
import pytest

from whisper_trtllm_tpu.models.gptj import convert_hf_gptj, forward


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import GPTJConfig as HFConfig
    from transformers import GPTJForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=89, n_positions=32, n_embd=32, n_layer=2, n_head=4,
        rotary_dim=4, n_inner=64, eos_token_id=2, bos_token_id=1,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = GPTJForCausalLM(hf_cfg).eval()
    params, cfg = convert_hf_gptj(hf)
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
    """KV-cached generate (shared causal-LM runtime) vs HF generate —
    exercises interleaved partial RoPE at traced step positions."""
    import jax.numpy as jnp
    import torch

    from whisper_trtllm_tpu.models.gptj import generate

    hf, params, cfg = hf_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=8, do_sample=False, pad_token_id=cfg.eos_token_id,
        ).numpy()
    ours = np.asarray(generate(params, cfg, jnp.asarray(prompt), 8))
    n = min(ours.shape[1], theirs.shape[1])
    np.testing.assert_array_equal(ours[:, :n], theirs[:, :n])
