"""Ragged (per-row input-lengths) generation across the zoo: each row of a
right-padded variable-length batch must equal the corresponding
independent single-row generate (the reference's
GenerationSession.decode(input_ids, input_lengths) contract, reference:
tensorrt_llm/runtime/generation.py:782 + functional.py:3316)."""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

CASES = [
    ("gpt", "GPTConfig"),
    ("llama", "LlamaConfig"),
    ("opt", "OPTConfig"),
    ("gptj", "GPTJConfig"),
    ("gptneox", "GPTNeoXConfig"),
    ("bloom", "BloomConfig"),
    ("chatglm6b", "ChatGLM6BConfig"),
]


@pytest.mark.parametrize("family,cfg_cls", CASES)
def test_ragged_matches_per_row(family, cfg_cls, rng):
    mod = importlib.import_module(f"whisper_trtllm_tpu.models.{family}")
    cfg = getattr(mod, cfg_cls).testing()
    params = mod.init_params(cfg, seed=0)

    lens = np.array([2, 5, 3], np.int32)
    pad = int(lens.max())
    new = 5
    prompt = rng.integers(3, cfg.vocab_size, (3, pad)).astype(np.int32)
    for b, l in enumerate(lens):
        prompt[b, l:] = 7        # right-pad garbage must not matter

    batched = np.asarray(
        mod.generate_ragged(params, cfg, jnp.asarray(prompt), lens,
                            max_new_tokens=new))
    for b, l in enumerate(lens):
        single = np.asarray(
            mod.generate(params, cfg, jnp.asarray(prompt[b : b + 1, :l]),
                         max_new_tokens=new))[0]
        np.testing.assert_array_equal(
            batched[b, :l], prompt[b, :l],
            err_msg=f"{family}: prompt region")
        np.testing.assert_array_equal(
            batched[b, l : l + new], single[l : l + new],
            err_msg=f"{family}: continuation")


def test_ragged_sampling_deterministic_and_penalized(rng):
    """Sampling knobs through the ragged loop: per-lane repetition penalty
    must not crash (the (B,) pos broadcast), the draw is seed-deterministic,
    and do_sample=True actually samples (differs across seeds somewhere)."""
    from whisper_trtllm_tpu.models.gpt import GPTConfig, generate_ragged, init_params

    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    lens = np.array([2, 4], np.int32)
    prompt = rng.integers(3, cfg.vocab_size, (2, 4)).astype(np.int32)

    a = np.asarray(generate_ragged(
        params, cfg, jnp.asarray(prompt), lens, max_new_tokens=6,
        temperature=0.8, top_k=5, repetition_penalty=1.3, seed=7))
    b = np.asarray(generate_ragged(
        params, cfg, jnp.asarray(prompt), lens, max_new_tokens=6,
        temperature=0.8, top_k=5, repetition_penalty=1.3, seed=7))
    np.testing.assert_array_equal(a, b)

    outs = [np.asarray(generate_ragged(
        params, cfg, jnp.asarray(prompt), lens, max_new_tokens=6,
        do_sample=True, seed=s)) for s in range(4)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:]), \
        "do_sample=True produced identical outputs across seeds"


def test_ragged_rejects_zero_new_tokens(rng):
    from whisper_trtllm_tpu.models.gpt import GPTConfig, generate_ragged, init_params

    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    prompt = rng.integers(3, cfg.vocab_size, (1, 3)).astype(np.int32)
    with pytest.raises(ValueError, match="max_new_tokens"):
        generate_ragged(params, cfg, jnp.asarray(prompt),
                        np.array([3], np.int32), max_new_tokens=0)
