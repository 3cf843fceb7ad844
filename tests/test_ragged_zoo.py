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
