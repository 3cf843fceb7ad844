"""Continuous batching for causal LMs: staggered variable-length requests
through fixed lanes must reproduce single-request greedy outputs exactly
(the reference's GPT in-flight batching contract, reference:
cpp/tensorrt_llm/plugins/ibGptAttentionPlugin/,
docs/in_flight_batching.md:16-50)."""

import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.models.gpt import GPTConfig, generate, init_params
from whisper_trtllm_tpu.models.gpt import model as gm
from whisper_trtllm_tpu.runtime.ifb_lm import CausalLMInflightBatcher


def _make_batcher(params, cfg, num_lanes, max_new):
    return CausalLMInflightBatcher(
        params, cfg,
        prefill=lambda p, t, l, ck, cv: gm._prefill_ragged(p, cfg, t, l, ck, cv),
        step=lambda p, tok, pos, ck, cv: gm._step(p, cfg, tok, pos, ck, cv),
        cache_heads=cfg.n_head, head_dim=cfg.head_dim,
        n_layer=cfg.n_layer, eos_token_id=cfg.eos_token_id,
        num_lanes=num_lanes, max_prompt_len=6, max_new_tokens=max_new,
        segment_steps=4,
    )


def test_ifb_lm_matches_single_request(rng):
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    max_new = 8
    b = _make_batcher(params, cfg, num_lanes=2, max_new=max_new)

    prompts = [
        rng.integers(3, cfg.vocab_size, (n,)).astype(np.int32)
        for n in (2, 5, 3, 4, 2)
    ]
    rids = [b.submit(p) for p in prompts]
    b.run()

    for rid, prompt in zip(rids, prompts):
        row = b.fetch(rid)
        assert row is not None
        plen = prompt.size
        np.testing.assert_array_equal(row[:plen], prompt)
        single = np.asarray(
            generate(params, cfg, jnp.asarray(prompt[None]), max_new))[0]
        k = min(row.size, single.size) - plen
        assert k > 0
        np.testing.assert_array_equal(row[plen : plen + k],
                                      single[plen : plen + k])


def test_ifb_lm_lane_reuse_and_more_requests_than_lanes(rng):
    """7 identical requests through 2 lanes: every lane/segment pairing must
    produce the identical greedy output (lane state fully resets on admit)."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=1)
    b = _make_batcher(params, cfg, num_lanes=2, max_new=6)
    prompt = rng.integers(3, cfg.vocab_size, (3,)).astype(np.int32)
    rids = [b.submit(prompt) for _ in range(7)]
    b.run()
    outs = [b.fetch(r) for r in rids]
    assert all(o is not None for o in outs)
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])


def test_ifb_lm_respects_max_new_tokens(rng):
    """A short prompt must stop after max_new_tokens generated tokens, not
    run to the shared buffer end (per-request cap, like the reference's
    per-request max_new_tokens in the batch manager)."""
    cfg = GPTConfig.testing(eos_token_id=-1)   # never hits EOS
    params = init_params(cfg, seed=0)
    max_new = 4
    b = _make_batcher(params, cfg, num_lanes=2, max_new=max_new)
    rid = b.submit(rng.integers(3, cfg.vocab_size, (2,)).astype(np.int32))
    b.run()
    out = b.fetch(rid)
    assert out.size == 2 + max_new, out
