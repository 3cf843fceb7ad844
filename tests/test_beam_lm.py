"""Causal-LM beam-search parity vs HF torch beam search on tiny random
models — the reference's beam_width>1 GenerationSession path for GPT-style
engines (reference: tensorrt_llm/runtime/generation.py:898-975,
cpp/tensorrt_llm/kernels/onlineSoftmaxBeamsearchKernels.cu,
cpp/tensorrt_llm/thop/gatherTreeOp.cpp:74)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.models import gpt as gpt_mod
from whisper_trtllm_tpu.models import llama as llama_mod


@pytest.fixture(scope="module")
def gpt_pair():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(
        vocab_size=89, n_positions=48, n_embd=32, n_layer=2, n_head=4,
        eos_token_id=2, bos_token_id=1,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    params, cfg = gpt_mod.convert_hf_gpt2(hf)
    return hf, params, cfg


@pytest.fixture(scope="module")
def llama_pair():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, eos_token_id=2, bos_token_id=1,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    params, cfg = llama_mod.convert_hf_llama(hf)
    return hf, params, cfg


def _hf_beam(hf, prompt, max_new, k, length_penalty):
    import torch

    with torch.no_grad():
        out = hf.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=max_new, num_beams=k, num_return_sequences=k,
            do_sample=False, early_stopping=True,
            length_penalty=length_penalty,
            pad_token_id=hf.config.eos_token_id,
            return_dict_in_generate=True, output_scores=True,
        )
    seqs = out.sequences.numpy().reshape(prompt.shape[0], k, -1)
    scores = out.sequences_scores.numpy().reshape(prompt.shape[0], k)
    return seqs, scores


@pytest.mark.parametrize("num_beams,length_penalty",
                         [(2, 1.0), (4, 1.0), (3, 2.0)])
def test_gpt_beam_matches_hf(gpt_pair, rng, num_beams, length_penalty):
    hf, params, cfg = gpt_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    max_new = 12

    theirs, their_scores = _hf_beam(hf, prompt, max_new, num_beams,
                                    length_penalty)
    tokens, scores, lengths = gpt_mod.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new, num_beams,
        length_penalty=length_penalty)
    tokens, scores = np.asarray(tokens), np.asarray(scores)

    w = theirs.shape[-1]
    np.testing.assert_array_equal(tokens[:, :, :w], theirs)
    # everything past a hypothesis's length is eos padding
    col = np.arange(tokens.shape[-1])[None, None, :]
    assert (np.where(col >= np.asarray(lengths)[:, :, None], tokens,
                     cfg.eos_token_id) == cfg.eos_token_id).all()
    np.testing.assert_allclose(scores, their_scores, atol=1e-4, rtol=1e-4)


def test_llama_beam_matches_hf(llama_pair, rng):
    hf, params, cfg = llama_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 5)).astype(np.int32)
    max_new = 10

    theirs, their_scores = _hf_beam(hf, prompt, max_new, 3, 1.0)
    tokens, scores, _ = llama_mod.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new, 3)
    tokens, scores = np.asarray(tokens), np.asarray(scores)

    w = theirs.shape[-1]
    np.testing.assert_array_equal(tokens[:, :, :w], theirs)
    np.testing.assert_allclose(scores, their_scores, atol=1e-4, rtol=1e-4)


def test_beam_k1_matches_greedy(gpt_pair, rng):
    """K=1 beam search degenerates to greedy decoding (same argmax path the
    lockstep loop takes)."""
    hf, params, cfg = gpt_pair
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    greedy = np.asarray(
        gpt_mod.generate(params, cfg, jnp.asarray(prompt), 10))
    tokens, _, _ = gpt_mod.generate_beam(
        params, cfg, jnp.asarray(prompt), 10, num_beams=1)
    np.testing.assert_array_equal(np.asarray(tokens)[:, 0], greedy)


def test_beam_scores_sorted(gpt_pair, rng):
    hf, params, cfg = gpt_pair
    prompt = rng.integers(3, cfg.vocab_size, (3, 4)).astype(np.int32)
    _, scores, lengths = gpt_mod.generate_beam(
        params, cfg, jnp.asarray(prompt), 8, num_beams=4)
    scores = np.asarray(scores)
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert np.isfinite(scores).all()
    assert (np.asarray(lengths) > 0).all()


def _tiny_hf_pair(family):
    """Build (hf, params, cfg) from each family's tiny HF config — mirrors
    the per-family parity-test fixtures."""
    import importlib

    import torch
    import transformers as T

    torch.manual_seed(0)
    if family == "opt":
        hf = T.OPTForCausalLM(T.OPTConfig(
            vocab_size=89, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=64, max_position_embeddings=32,
            do_layer_norm_before=True, word_embed_proj_dim=32,
            eos_token_id=2, bos_token_id=1, pad_token_id=0, dropout=0.0,
        )).eval()
    elif family == "gptj":
        hf = T.GPTJForCausalLM(T.GPTJConfig(
            vocab_size=89, n_positions=32, n_embd=32, n_layer=2, n_head=4,
            rotary_dim=4, eos_token_id=2, bos_token_id=1,
        )).eval()
    elif family == "gptneox":
        hf = T.GPTNeoXForCausalLM(T.GPTNeoXConfig(
            vocab_size=89, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, rotary_pct=0.25, eos_token_id=2,
            use_parallel_residual=True,
        )).eval()
    elif family == "bloom":
        hf = T.BloomForCausalLM(T.BloomConfig(
            vocab_size=89, hidden_size=32, n_layer=2, n_head=4,
            eos_token_id=2, bos_token_id=1,
        )).eval()
    else:
        raise ValueError(family)
    mod = importlib.import_module(f"whisper_trtllm_tpu.models.{family}")
    convert = getattr(mod, [n for n in dir(mod)
                            if n.startswith("convert_hf")][0])
    params, cfg = convert(hf)
    return mod, hf, params, cfg


@pytest.mark.parametrize("family", ["opt", "gptj", "gptneox", "bloom"])
def test_zoo_beam_matches_hf(family, rng):
    """Beam search for the remaining decoder families through the
    model-agnostic factory (runtime/beam_lm.py::make_generate_beam) — the
    reference's beam_width>1 works for every engine; so does ours."""
    mod, hf, params, cfg = _tiny_hf_pair(family)
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)
    max_new = 8

    theirs, their_scores = _hf_beam(hf, prompt, max_new, 2, 1.0)
    tokens, scores, _ = mod.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new, 2)
    tokens, scores = np.asarray(tokens), np.asarray(scores)
    w = theirs.shape[-1]
    np.testing.assert_array_equal(tokens[:, :, :w], theirs)
    np.testing.assert_allclose(scores, their_scores, atol=1e-4, rtol=1e-4)


def test_chatglm_beam_k1_matches_greedy(rng):
    """GLM beam with one beam must reproduce greedy exactly (no HF class
    ships for chatglm-6b; the greedy path itself is torch-twin-parity-
    tested in test_chatglm6b.py)."""
    from whisper_trtllm_tpu.models import chatglm6b as glm

    cfg = glm.ChatGLM6BConfig.testing()
    params = glm.init_params(cfg, seed=0)
    prompt = rng.integers(3, cfg.vocab_size, (2, 6)).astype(np.int32)
    greedy = np.asarray(glm.generate(params, cfg, jnp.asarray(prompt),
                                     max_new_tokens=8))
    tokens, scores, lengths = glm.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new_tokens=8, num_beams=1)
    tokens = np.asarray(tokens)
    for b in range(2):
        n = int(np.asarray(lengths)[b, 0])
        np.testing.assert_array_equal(tokens[b, 0, :n], greedy[b, :n])


def test_chatglm_beam_scores_sorted(rng):
    from whisper_trtllm_tpu.models import chatglm6b as glm

    cfg = glm.ChatGLM6BConfig.testing()
    params = glm.init_params(cfg, seed=0)
    prompt = rng.integers(3, cfg.vocab_size, (1, 5)).astype(np.int32)
    _, scores, _ = glm.generate_beam(params, cfg, jnp.asarray(prompt),
                                     max_new_tokens=6, num_beams=3)
    s = np.asarray(scores)[0]
    assert (s[:-1] >= s[1:] - 1e-6).all()
