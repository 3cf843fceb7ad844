"""Beam search over the PAGED KV pool (host-stepped).

The reference's paged KV manager carries beam semantics — context blocks
born shared across beams, per-beam private tails, beam reorder moving block
links (reference: tensorrt_llm/runtime/kv_cache_manager.py:263-292, consumed
by GenerationSession's paged decode hooks, generation.py:842-855,977-988).
runtime/kv_cache_manager.py implements those ledgers; this module is the
decode loop that actually drives them with beam_width > 1:

  * the context phase writes the prompt's K/V once into blocks shared by
    every beam (refcount = K),
  * each generation step writes through per-beam PRIVATE tail blocks,
  * after each beam expansion the block tables are re-parented
    (``PagedKVCache.reorder_beams`` — the link-moving half of the
    reference's cache_indirection) and the possibly-shared tail is
    copy-forked (``fork_tail``) so divergent beams never clobber one
    another's partial block — the write-hazard the reference tolerates by
    sharing the tail (kv_cache_manager.py:276-280) and this repo fixed.

The expansion bookkeeping (alive/finished pools, EOS retirement, length
penalty) runs host-side in numpy but follows runtime/beam_lm.py's jitted
formulation operation-for-operation (same tie-breaking: descending stable
order == lax.top_k), so a paged beam decode is token- and score-identical
to the dense ``beam_generate_tokens`` — proven in tests/test_beam_paged.py.
Host-stepping is the right shape here: the block manager mutates between
steps (like the reference, where KVCacheManager.step runs between engine
enqueues), so the loop cannot live inside one jit.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.runtime.kv_cache_manager import PagedKVCache

NEG_INF = np.float32(-1.0e9)


def _log_softmax_f32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return (s - np.log(np.exp(s).sum(axis=-1, keepdims=True,
                                     dtype=np.float32))).astype(np.float32)


def _top(x: np.ndarray, n: int) -> np.ndarray:
    """Indices of the n largest entries, ties broken by lowest index —
    lax.top_k's order, reproduced with a descending stable sort."""
    return np.argsort(-x, kind="stable")[:n]


class _Pools:
    """Cached jitted (prefill, step) pair per (fns, static shapes)."""

    _cache: dict = {}

    @classmethod
    def get(cls, prefill: Callable, step: Callable):
        key = (prefill, step)
        if key not in cls._cache:
            cls._cache[key] = (jax.jit(prefill), jax.jit(step))
        return cls._cache[key]


def paged_beam_search(
    prefill_paged: Callable,
    step_paged: Callable,
    params: dict,
    prompt: np.ndarray,
    *,
    pool_shape: Tuple[int, int, int, int, int],
    tokens_per_block: int,
    max_blocks_per_seq: int,
    max_new_tokens: int,
    eos_token_id: int,
    num_beams: int,
    length_penalty: float = 1.0,
    cache_dtype=jnp.float32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-request beam search against paged K/V pools.

    ``prefill_paged(params, tokens(1,P), lens(1,), pool_k, pool_v,
    tables(1,M))`` and ``step_paged(params, tok(K,), pos(K,), pool_k,
    pool_v, tables(K,M))`` follow the causal-LM paged contract
    (models/gpt/model.py::_prefill_paged/_step_paged). ``pool_shape`` =
    (L, num_blocks, tokens_per_block, H, dh). The prompt must be
    block-aligned (PagedKVCache beam admission rule — a partial shared tail
    would be written divergently). Returns (tokens (K, P+max_new), scores
    (K,), lengths (K,)) best-first, identical to the dense
    ``beam_lm.beam_generate_tokens``.
    """
    prompt = np.asarray(prompt, np.int32).reshape(-1)
    p = prompt.size
    k = num_beams
    max_len = p + max_new_tokens
    lp = np.float32(length_penalty)

    mgr = PagedKVCache(pool_shape[1], tokens_per_block, max_blocks_per_seq,
                       beam_width=k)
    row = mgr.admit(p)
    assert row == 0
    jit_prefill, jit_step = _Pools.get(prefill_paged, step_paged)

    pool_k = jnp.zeros(pool_shape, cache_dtype)
    pool_v = jnp.zeros(pool_shape, cache_dtype)

    # ---- context phase at beam 1: context blocks are beam-shared, one
    # write serves every beam ----
    tables = mgr.block_tables()[0]                       # (K, M)
    logits0, pool_k, pool_v = jit_prefill(
        params, jnp.asarray(prompt[None]), jnp.asarray([p], jnp.int32),
        pool_k, pool_v, jnp.asarray(tables[0:1]))

    # ---- host-side beam pools (numpy twins of beam_lm's carry) ----
    alive_tokens = np.full((k, max_len), eos_token_id, np.int32)
    alive_tokens[:, :p] = prompt[None]
    alive_scores = np.where(np.arange(k) == 0, np.float32(0.0), NEG_INF)
    fin_tokens = np.full((k, max_len), eos_token_id, np.int32)
    fin_scores = np.full((k,), NEG_INF)
    fin_lens = np.zeros((k,), np.int32)

    def done() -> bool:
        return bool(np.all(fin_scores > NEG_INF / 2))

    def expand(logits: np.ndarray, nxt: int) -> np.ndarray:
        """One beam expansion (numpy twin of beam_lm.expand, b=1).
        Mutates the pools above; returns alive_parents (K,)."""
        nonlocal alive_tokens, alive_scores, fin_tokens, fin_scores, fin_lens
        vocab = logits.shape[-1]
        logp = _log_softmax_f32(logits)                          # (K, V)
        cand = (alive_scores[:, None] + logp).reshape(-1)
        topi = _top(cand, 2 * k)
        topv = cand[topi]
        parents = (topi // vocab).astype(np.int64)
        toks = (topi % vocab).astype(np.int32)

        seqs = alive_tokens[parents].copy()
        seqs[:, nxt] = toks
        in_top_k = np.arange(2 * k) < k
        is_eos_tok = toks == eos_token_id
        is_eos = is_eos_tok & in_top_k & (topv > NEG_INF / 2)

        alive_cand = np.where(is_eos_tok, NEG_INF, topv)
        alive_sel = _top(alive_cand, k)
        new_alive_scores = alive_cand[alive_sel].astype(np.float32)
        new_alive_tokens = seqs[alive_sel]
        alive_parents = parents[alive_sel]

        pen = np.float32(nxt + 1 - p) ** lp
        fin_cand = np.where(is_eos, (topv / pen).astype(np.float32), NEG_INF)
        if done():
            fin_cand[:] = NEG_INF
        merged_scores = np.concatenate([fin_scores, fin_cand])
        merged_tokens = np.concatenate([fin_tokens, seqs])
        merged_lens = np.concatenate(
            [fin_lens, np.full((2 * k,), nxt + 1, np.int32)])
        fin_sel = _top(merged_scores, k)
        fin_scores = merged_scores[fin_sel].astype(np.float32)
        fin_tokens = merged_tokens[fin_sel]
        fin_lens = merged_lens[fin_sel]

        alive_tokens, alive_scores = new_alive_tokens, new_alive_scores
        return alive_parents

    def reorder_and_fork(parents: np.ndarray):
        """Move block links to the surviving parents, then give every beam
        a private copy of the (possibly shared) partial tail block."""
        nonlocal pool_k, pool_v
        mgr.reorder_beams(0, parents)
        pairs = mgr.fork_tail(0)
        src = jnp.asarray(pairs[:, 0])
        dst = jnp.asarray(pairs[:, 1])
        # gather-then-scatter both directions at once: fork pairs may chain
        # (dst of one pair == untouched src of another is impossible — dst
        # blocks come fresh off the free stack — so a single scatter is safe)
        pool_k = pool_k.at[:, dst].set(pool_k[:, src])
        pool_v = pool_v.at[:, dst].set(pool_v[:, src])

    # first expansion from the context-phase logits (beam 0 only is live)
    parents = expand(np.asarray(logits0).repeat(k, axis=0), p)
    reorder_and_fork(parents)

    pos = p
    while pos < max_len - 1 and not done():
        cur = jnp.asarray(alive_tokens[:, pos])
        tables = jnp.asarray(mgr.block_tables()[0])       # (K, M)
        pos_arr = jnp.full((k,), pos, jnp.int32)
        logits, pool_k, pool_v = jit_step(
            params, cur, pos_arr, pool_k, pool_v, tables)
        parents = expand(np.asarray(logits), pos + 1)
        reorder_and_fork(parents)
        mgr.advance(np.asarray([done()]))
        pos += 1
    if len(mgr):
        mgr.advance(np.asarray([True]))   # release every block

    # ---- finalize (beam_lm's max-length fallback) ----
    alive_len = pos + 1
    alive_final = alive_scores / np.float32(alive_len - p) ** lp
    if done():
        alive_final = np.full_like(alive_final, NEG_INF)
    merged_scores = np.concatenate([fin_scores, alive_final])
    merged_tokens = np.concatenate([fin_tokens, alive_tokens])
    merged_lens = np.concatenate(
        [fin_lens, np.full((k,), alive_len, np.int32)])
    sel = _top(merged_scores, k)
    return (merged_tokens[sel], merged_scores[sel].astype(np.float32),
            merged_lens[sel])
