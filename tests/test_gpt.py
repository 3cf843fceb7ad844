"""GPT zoo model parity vs HF GPT-2 on tiny random configs
(analog of reference: tests/model/test_gpt.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.models.gpt import convert_hf_gpt2, forward, generate


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(
        vocab_size=89, n_positions=32, n_embd=32, n_layer=2, n_head=4,
        eos_token_id=2, bos_token_id=1,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    params, cfg = convert_hf_gpt2(hf)
    return hf, params, cfg


def test_forward_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_generate_matches_hf(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    with torch.no_grad():
        theirs = hf.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=12, do_sample=False,
            pad_token_id=cfg.eos_token_id,
        ).numpy()
    ours = np.asarray(generate(params, cfg, jnp.asarray(prompt), 12))
    np.testing.assert_array_equal(ours[:, : theirs.shape[1]], theirs)


def test_generate_eos_padding(hf_pair):
    hf, params, cfg = hf_pair
    prompt = np.asarray([[5, 6, 7]], np.int32)
    out = np.asarray(generate(params, cfg, jnp.asarray(prompt), 8))
    # after the first EOS everything is EOS (pad)
    eos_pos = np.nonzero(out[0] == cfg.eos_token_id)[0]
    if len(eos_pos):
        assert (out[0, eos_pos[0]:] == cfg.eos_token_id).all()


def test_sampled_generate_deterministic_and_diverse(hf_pair, rng):
    hf, params, cfg = hf_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    a = np.asarray(generate(params, cfg, jnp.asarray(prompt), 10,
                            temperature=1.3, top_k=8, seed=7))
    b = np.asarray(generate(params, cfg, jnp.asarray(prompt), 10,
                            temperature=1.3, top_k=8, seed=7))
    c = np.asarray(generate(params, cfg, jnp.asarray(prompt), 10,
                            temperature=1.3, top_k=8, seed=8))
    np.testing.assert_array_equal(a, b)   # deterministic per seed
    assert not np.array_equal(a, c)       # seeds diverge
    greedy = np.asarray(generate(params, cfg, jnp.asarray(prompt), 10))
    assert greedy.shape == a.shape


def test_generate_ragged_matches_per_row(hf_pair, rng):
    """Variable-length batched generation (per-row input_lengths, the
    reference's GenerationSession.decode ragged path + gather_last_token_logits,
    reference: tensorrt_llm/runtime/generation.py:782, functional.py:3316):
    each row of the ragged batch equals an independent single-row generate."""
    from whisper_trtllm_tpu.models.gpt import generate_ragged

    hf, params, cfg = hf_pair
    lens = np.array([2, 5, 3], np.int32)
    pad = int(lens.max())
    new = 6
    prompt = rng.integers(3, cfg.vocab_size, (3, pad)).astype(np.int32)
    # right-pad rows past their length with an arbitrary token — must not
    # affect the output
    for b, l in enumerate(lens):
        prompt[b, l:] = 7

    batched = np.asarray(
        generate_ragged(params, cfg, prompt, lens, max_new_tokens=new))
    eos = cfg.eos_token_id
    for b, l in enumerate(lens):
        single = np.asarray(
            generate(params, cfg, prompt[b : b + 1, :l], max_new_tokens=new)
        )[0]
        row = batched[b]
        # prompt region
        np.testing.assert_array_equal(row[:l], prompt[b, :l])
        # continuation (incl. eos padding once finished)
        np.testing.assert_array_equal(row[l : l + new], single[l : l + new])
        # everything past the lane's continuation is eos padding
        assert (row[l + new:] == eos).all()
