"""Beam search over the paged KV pool vs dense beam search.

The reference's KVCacheManager carries beam-sharing semantics (context
blocks shared across beams, per-beam generation blocks, beam-aligned
pointer arrays — reference: tensorrt_llm/runtime/kv_cache_manager.py:
263-292); this exercises the whole path end-to-end: a paged beam decode
(block tables + reorder_beams + fork_tail + pool copies) must be token-,
score- and length-identical to the dense beam search."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.models.gpt import GPTConfig, init_params
from whisper_trtllm_tpu.models.gpt import model as gm
from whisper_trtllm_tpu.runtime.beam_paged import paged_beam_search


def _run_paged(params, cfg, prompt, *, num_blocks, tokens_per_block,
               max_blocks_per_seq, max_new, k, length_penalty=1.0):
    return paged_beam_search(
        lambda p, t, l, pk, pv, tb: gm._prefill_paged(p, cfg, t, l, pk, pv, tb),
        lambda p, tok, pos, pk, pv, tb: gm._step_paged(
            p, cfg, tok, pos, pk, pv, tb),
        params, prompt,
        pool_shape=(cfg.n_layer, num_blocks, tokens_per_block,
                    cfg.n_head, cfg.head_dim),
        tokens_per_block=tokens_per_block,
        max_blocks_per_seq=max_blocks_per_seq,
        max_new_tokens=max_new, eos_token_id=cfg.eos_token_id,
        num_beams=k, length_penalty=length_penalty,
    )


@pytest.mark.parametrize("length_penalty", [1.0, 2.0])
def test_paged_beam_matches_dense(rng, length_penalty):
    """beam_width 2, tokens_per_block 4, 11 generated tokens — the decode
    crosses block boundaries twice while beams reorder every step."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    tpb, max_new, k = 4, 11, 2
    prompt = rng.integers(3, cfg.vocab_size, (1, 8)).astype(np.int32)

    ref_tokens, ref_scores, ref_lens = gm.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new_tokens=max_new,
        num_beams=k, length_penalty=length_penalty)

    tokens, scores, lens = _run_paged(
        params, cfg, prompt[0], num_blocks=24, tokens_per_block=tpb,
        max_blocks_per_seq=8, max_new=max_new, k=k,
        length_penalty=length_penalty)

    np.testing.assert_array_equal(tokens, np.asarray(ref_tokens)[0])
    np.testing.assert_array_equal(lens, np.asarray(ref_lens)[0])
    np.testing.assert_allclose(scores, np.asarray(ref_scores)[0],
                               rtol=2e-5, atol=2e-5)


def test_paged_beam_wider(rng):
    """beam_width 4 with a tight pool: sharing keeps the context blocks
    single-copy, so the pool fits where K private copies would not."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=1)
    tpb, max_new, k = 4, 9, 4
    prompt = rng.integers(3, cfg.vocab_size, (1, 12)).astype(np.int32)

    ref_tokens, ref_scores, ref_lens = gm.generate_beam(
        params, cfg, jnp.asarray(prompt), max_new_tokens=max_new,
        num_beams=k, length_penalty=1.0)

    # context 12 tokens = 3 blocks SHARED + per-beam tails. A dense per-beam
    # copy of the context alone would need 3*4=12 blocks; the shared pool
    # proves sharing with 3 + growth headroom.
    tokens, scores, lens = _run_paged(
        params, cfg, prompt[0], num_blocks=3 + 4 * 4, tokens_per_block=tpb,
        max_blocks_per_seq=8, max_new=max_new, k=k)

    np.testing.assert_array_equal(tokens, np.asarray(ref_tokens)[0])
    np.testing.assert_array_equal(lens, np.asarray(ref_lens)[0])
    np.testing.assert_allclose(scores, np.asarray(ref_scores)[0],
                               rtol=2e-5, atol=2e-5)


def test_paged_beam_releases_all_blocks(rng):
    """After a search completes, every block is back on the free stack —
    reorder/fork churn must not leak refcounts."""
    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=2)
    from whisper_trtllm_tpu.runtime import beam_paged as bp

    prompt = rng.integers(3, cfg.vocab_size, (1, 4)).astype(np.int32)
    # capture the manager instance via a tiny subclass
    mgrs = []
    orig_init = bp.PagedKVCache.__init__

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        mgrs.append(self)

    bp.PagedKVCache.__init__ = spy_init
    try:
        _run_paged(params, cfg, prompt[0], num_blocks=16, tokens_per_block=4,
                   max_blocks_per_seq=6, max_new=7, k=2)
    finally:
        bp.PagedKVCache.__init__ = orig_init
    assert len(mgrs) == 1
    mgr = mgrs[0]
    assert mgr.ledger.free == mgr.ledger.num_blocks
    assert len(mgr) == 0
