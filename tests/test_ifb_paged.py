"""Paged-KV continuous batching: block-table attention + BlockLedger
admission control must reproduce single-request greedy outputs exactly (the
reference's batch_manager + paged gptAttention pairing, reference:
cpp/tensorrt_llm/batch_manager/trtGptModelInflightBatching.h,
tensorrt_llm/runtime/generation.py:842-855,977-988)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.models.gpt import GPTConfig, generate, init_params
from whisper_trtllm_tpu.models.gpt import model as gm
from whisper_trtllm_tpu.runtime.ifb_paged import PagedCausalLMInflightBatcher


def _make_batcher(params, cfg, num_blocks, num_lanes, max_new,
                  tokens_per_block=4, segment_steps=4, max_prompt_len=6):
    return PagedCausalLMInflightBatcher(
        params, cfg,
        prefill=lambda p, t, l, pk, pv, tb: gm._prefill_paged(
            p, cfg, t, l, pk, pv, tb),
        step=lambda p, tok, pos, pk, pv, tb: gm._step_paged(
            p, cfg, tok, pos, pk, pv, tb),
        cache_heads=cfg.n_head, head_dim=cfg.head_dim,
        n_layer=cfg.n_layer, eos_token_id=cfg.eos_token_id,
        num_blocks=num_blocks, tokens_per_block=tokens_per_block,
        num_lanes=num_lanes, max_prompt_len=max_prompt_len,
        max_new_tokens=max_new, segment_steps=segment_steps,
    )


def test_paged_ifb_matches_single_request(rng):
    """Staggered variable-length requests through 2 lanes sharing one pool:
    every request's tokens equal its independent dense greedy decode."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    max_new = 8
    b = _make_batcher(params, cfg, num_blocks=16, num_lanes=2,
                      max_new=max_new)

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
        np.testing.assert_array_equal(row[plen: plen + k],
                                      single[plen: plen + k])
    # every block returned to the pool after the last retirement
    assert b.free_blocks() == 16


def test_paged_ifb_admission_backpressure(rng):
    """The pool is the scheduling signal: with blocks for ~one request at a
    time, requests must queue on free blocks and still all complete
    correctly (the reference's KV-capacity admission gating)."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=1)
    max_new = 3
    # worst case/request: 4 prompt + 3 new = 7 tokens -> 2 blocks @ tpb=4;
    # a 4-block pool holds exactly two in flight — lane 3 and queued
    # requests must wait on retirements
    b = _make_batcher(params, cfg, num_blocks=4, num_lanes=3,
                      max_new=max_new)
    prompts = [rng.integers(3, cfg.vocab_size, (4,)).astype(np.int32)
               for _ in range(4)]
    rids = [b.submit(p) for p in prompts]
    b.run()
    for rid, prompt in zip(rids, prompts):
        row = b.fetch(rid)
        assert row is not None
        single = np.asarray(
            generate(params, cfg, jnp.asarray(prompt[None]), max_new))[0]
        k = min(row.size, single.size) - prompt.size
        np.testing.assert_array_equal(row[prompt.size: prompt.size + k],
                                      single[prompt.size: prompt.size + k])
    assert b.free_blocks() == 4


def test_paged_ifb_pool_smaller_than_dense_equivalent(rng):
    """The point of paging: 3 lanes of max_len 12 would need 9 blocks dense
    (3 x ceil(12/4)); short requests complete with a 6-block pool because
    blocks recycle at retirement."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=2)
    b = _make_batcher(params, cfg, num_blocks=6, num_lanes=3, max_new=6)
    prompts = [rng.integers(3, cfg.vocab_size, (2,)).astype(np.int32)
               for _ in range(6)]
    rids = [b.submit(p) for p in prompts]
    b.run()
    assert all(b.fetch(r) is not None for r in rids)
    assert b.free_blocks() == 6


def test_paged_pool_exhaustion_raises():
    """A pool too small for even one worst-case request must fail loudly,
    not livelock."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=3)
    b = _make_batcher(params, cfg, num_blocks=2, num_lanes=1, max_new=8,
                      segment_steps=16)
    # prompt 6 + first token -> ceil(7/4) = 2 blocks admit OK; growth to
    # max_len 14 needs 4 blocks -> reservation stalls at 0 steps
    b.submit(np.asarray([3, 4, 5, 6, 7, 8], np.int32))
    with pytest.raises(RuntimeError, match="exhausted"):
        b.run()
