"""GPT-NeoX zoo model parity vs HF (partial neox RoPE, interleaved fused QKV,
parallel/sequential residual) (analog of reference:
tensorrt_llm/models/gptneox)."""

import jax
import numpy as np
import pytest

from whisper_trtllm_tpu.models.gptneox import convert_hf_gptneox, forward


def _make_hf(parallel: bool):
    import torch
    from transformers import GPTNeoXConfig as HFConfig
    from transformers import GPTNeoXForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=89, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, rotary_pct=0.5,
        use_parallel_residual=parallel, eos_token_id=2, bos_token_id=1,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    return GPTNeoXForCausalLM(hf_cfg).eval()


@pytest.mark.parametrize("parallel", [True, False])
def test_forward_parity(parallel, rng):
    import torch

    hf = _make_hf(parallel)
    params, cfg = convert_hf_gptneox(hf)
    assert cfg.use_parallel_residual is parallel
    assert cfg.rotary_dim == 4
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_greedy_continuation_matches_hf(rng):
    import torch

    hf = _make_hf(True)
    params, cfg = convert_hf_gptneox(hf)
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


@pytest.mark.parametrize("parallel", [True, False])
def test_cached_generate_matches_hf(parallel, rng):
    """KV-cached generate (shared causal-LM runtime) vs HF generate, both
    residual forms."""
    import jax.numpy as jnp
    import torch

    from whisper_trtllm_tpu.models.gptneox import generate

    hf = _make_hf(parallel)
    params, cfg = convert_hf_gptneox(hf)
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=8, do_sample=False, pad_token_id=cfg.eos_token_id,
        ).numpy()
    ours = np.asarray(generate(params, cfg, jnp.asarray(prompt), 8))
    n = min(ours.shape[1], theirs.shape[1])
    np.testing.assert_array_equal(ours[:, :n], theirs[:, :n])
