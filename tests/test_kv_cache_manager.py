"""Paged KV cache: host-side block-ledger scenarios (covering the behaviors
of reference: tests/test_kv_cache_manager.py — refcounting, beam sharing,
exhaustion, the grow/retire/compact lifecycle) plus device-side numerics —
paged attention through block tables must equal the contiguous cache
bit-for-bit on the same tokens (the property the reference trusts its
pointer plumbing to have but never tests end-to-end)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.ops.attention import (
    init_kv_cache,
    init_paged_kv_cache,
    mha_decode_step,
    paged_mha_decode_step,
    paged_update_kv_cache,
    update_kv_cache,
)
from whisper_trtllm_tpu.runtime.kv_cache_manager import (
    BlockLedger,
    PagedKVCache,
)


def test_ledger_refcounts():
    """Take/ref/unref accounting (the Block.add_link/remove_link behavior of
    reference test_kv_cache_manager.py::test_block, as vector ops)."""
    ledger = BlockLedger(4)
    assert ledger.free == 4
    got = ledger.take(2)
    np.testing.assert_array_equal(got, [0, 1])  # fresh ledger: ascending
    assert ledger.free == 2
    assert ledger.refcount(0) == 1
    ledger.ref([0, 0])  # repeated entries accumulate
    assert ledger.refcount(0) == 3
    ledger.unref([0, 0, 1])
    assert ledger.refcount(0) == 1 and ledger.refcount(1) == 0
    assert ledger.free == 3  # block 1 returned
    ledger.unref([0])
    assert ledger.free == 4
    with pytest.raises(RuntimeError, match="underflow"):
        ledger.unref([0])


def test_ledger_shared_birth_and_exhaustion():
    ledger = BlockLedger(2)
    got = ledger.take(1, refs=4)  # born beam-shared
    assert ledger.refcount(int(got[0])) == 4
    ledger.take(1)
    with pytest.raises(MemoryError, match="exhausted"):
        ledger.take(1)
    # a failed take mutates nothing
    assert ledger.free == 0
    ledger.unref(np.repeat(got, 4))
    assert ledger.free == 1


def test_ledger_recycles_freed_blocks():
    """Freed indices come back off the stack before untouched ones."""
    ledger = BlockLedger(8)
    a = ledger.take(3)
    ledger.unref(a[1:2])  # free block 1 only
    b = ledger.take(1)
    assert int(b[0]) == 1  # LIFO: most recently freed first
    assert ledger.free == 5


def test_cache_round_robin_tables():
    """Interleaved growth across a full batch fills the pool exactly and
    lands round-robin indices in the table (the index analog of the
    reference's verify_pointer_array address arithmetic); releasing rows
    returns every block."""
    n_seq, mbs, tpb = 8, 8, 4
    cache = PagedKVCache(num_blocks=n_seq * mbs, tokens_per_block=tpb,
                         max_blocks_per_seq=mbs)
    for _ in range(n_seq):
        cache.admit(tpb - 1)  # 1 block each: ctx+1 == tpb
    # step until every row owns all mbs blocks: each row grows by one block
    # every tpb steps, interleaved in batch order
    for _ in range((mbs - 1) * tpb):
        cache.advance([False] * n_seq)
    assert cache.ledger.free == 0
    table = cache.block_tables()
    assert table.shape == (n_seq, 1, mbs)
    for b in range(n_seq):
        for i in range(mbs):
            assert table[b, 0, i] == i * n_seq + b
    # rows full: the next boundary crossing raises
    with pytest.raises(RuntimeError, match="max_blocks_per_seq"):
        for _ in range(tpb):
            cache.advance([False] * n_seq)
    # retiring everything returns every block
    cache.advance([True] * n_seq)
    assert cache.ledger.free == n_seq * mbs and len(cache) == 0


def test_cache_lifecycle_grow_retire_compact():
    """Grow/retire/compact scenario (same lens 30/35/31 and
    tokens_per_block=32 as reference
    test_kv_cache_manager.py::test_kv_cache_manager)."""
    cache = PagedKVCache(num_blocks=128, tokens_per_block=32,
                         max_blocks_per_seq=16)
    for n in (30, 35, 31):
        cache.admit(n)

    def blocks_of(b):
        return int((cache.block_tables()[b, 0] >= 0).sum())

    assert [blocks_of(b) for b in range(3)] == [1, 2, 1]
    assert list(cache.lengths) == [30, 35, 31]

    for _ in range(3):
        cache.advance([False, False, False])
    assert [blocks_of(b) for b in range(3)] == [2, 2, 2]
    assert list(cache.lengths) == [33, 38, 34]

    # retire the middle sequence: rows compact, lengths shift
    cache.advance([False, True, False])
    assert len(cache) == 2 and list(cache.lengths) == [34, 35]
    assert cache.block_tables().shape[0] == 2
    assert [blocks_of(b) for b in range(2)] == [2, 2]

    cache.advance([False, True])
    assert len(cache) == 1 and list(cache.lengths) == [35]
    assert blocks_of(0) == 2

    # freed blocks actually return to the pool
    free0 = cache.ledger.free
    cache.advance([True])
    assert cache.ledger.free > free0
    assert len(cache) == 0 and cache.lengths.size == 0


def test_growth_pool_exhaustion():
    """A boundary crossing with a dry pool raises the back-pressure signal."""
    cache = PagedKVCache(num_blocks=2, tokens_per_block=2,
                         max_blocks_per_seq=4)
    cache.admit(1)
    cache.advance([False])  # len 1->2 crosses: takes the last block
    cache.advance([False])  # len 2->3, within the block
    with pytest.raises(MemoryError, match="exhausted"):
        cache.advance([False])  # len 3 crosses with nothing left
    # the failed step didn't advance the row
    assert list(cache.lengths) == [3]


def test_failed_admission_leaves_no_state():
    cache = PagedKVCache(num_blocks=1, tokens_per_block=4,
                         max_blocks_per_seq=4)
    cache.admit(3)
    with pytest.raises(MemoryError):
        cache.admit(3)
    assert len(cache) == 1 and cache.ledger.free == 0


def _write_context_paged(pool_k, pool_v, k_ctx, v_ctx, table, lengths):
    """Host loop writing each lane's context token-by-token through its own
    block-table row (single-lane calls so no lane writes past its table)."""
    for b, n in enumerate(lengths):
        for t in range(n):
            pool_k, pool_v = paged_update_kv_cache(
                pool_k, pool_v,
                k_ctx[b:b + 1, :, t:t + 1], v_ctx[b:b + 1, :, t:t + 1],
                jnp.asarray(table[b:b + 1]), jnp.asarray([t], jnp.int32))
    return pool_k, pool_v


def test_paged_decode_matches_contiguous(rng):
    """End-to-end numerics: ragged context fill + 6 decode steps with
    ledger-driven block growth — paged attention must equal the contiguous
    cache exactly (same dtype, same masked-softmax path)."""
    b, h, dh, tpb, mbs = 2, 2, 8, 4, 4
    tmax = tpb * mbs
    ctx = [5, 3]
    steps = 6

    cache = PagedKVCache(num_blocks=10, tokens_per_block=tpb,
                         max_blocks_per_seq=mbs)
    for n in ctx:
        cache.admit(n)

    k_ctx = (rng.standard_normal((b, h, max(ctx), dh)) * 0.4).astype(np.float32)
    v_ctx = rng.standard_normal((b, h, max(ctx), dh)).astype(np.float32)

    pool_k, pool_v = init_paged_kv_cache(10, tpb, h, dh)
    table = cache.block_tables()[:, 0]
    pool_k, pool_v = _write_context_paged(
        pool_k, pool_v, jnp.asarray(k_ctx), jnp.asarray(v_ctx), table, ctx)

    cache_k, cache_v = init_kv_cache(b, h, tmax, dh)
    for bi, n in enumerate(ctx):
        cache_k = cache_k.at[bi, :, :n].set(k_ctx[bi, :, :n])
        cache_v = cache_v.at[bi, :, :n].set(v_ctx[bi, :, :n])

    lens = np.asarray(ctx, np.int32)
    for step in range(steps):
        q = (rng.standard_normal((b, h, 1, dh)) * 0.4).astype(np.float32)
        k_new = (rng.standard_normal((b, h, 1, dh)) * 0.4).astype(np.float32)
        v_new = rng.standard_normal((b, h, 1, dh)).astype(np.float32)

        table = cache.block_tables()[:, 0]
        pool_k, pool_v = paged_update_kv_cache(
            pool_k, pool_v, jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(table), jnp.asarray(lens))
        cache_k, cache_v = update_kv_cache(
            cache_k, cache_v, jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(lens))
        lens = lens + 1

        paged = np.asarray(paged_mha_decode_step(
            jnp.asarray(q), pool_k, pool_v, jnp.asarray(table),
            jnp.asarray(lens)))
        contig = np.asarray(mha_decode_step(
            jnp.asarray(q), cache_k, cache_v, jnp.asarray(lens)))
        # float-epsilon gap only: the gathered window is (B,T,H,dh) vs the
        # contiguous (B,H,T,dh), so XLA fuses the dots differently
        np.testing.assert_allclose(paged, contig, atol=3e-7, rtol=1e-6)

        cache.advance([False] * b)
        assert list(cache.lengths) == list(lens)


def test_paged_decode_per_lane_padding_masked(rng):
    """-1 table padding never leaks: lane windows beyond valid_len carry
    garbage from the clipped gather and must be masked to exactly zero
    weight. Fill the whole pool with huge values; only the written tokens
    may influence the output."""
    b, h, dh, tpb, mbs = 1, 1, 8, 4, 2
    pool_k = jnp.full((4, tpb, h, dh), 1e4, jnp.float32)
    pool_v = jnp.full((4, tpb, h, dh), 1e4, jnp.float32)
    table = jnp.asarray([[2, -1]], jnp.int32)  # one real block, one pad

    k = (rng.standard_normal((b, h, 3, dh)) * 0.4).astype(np.float32)
    v = rng.standard_normal((b, h, 3, dh)).astype(np.float32)
    for t in range(3):
        pool_k, pool_v = paged_update_kv_cache(
            pool_k, pool_v, jnp.asarray(k[:, :, t:t + 1]),
            jnp.asarray(v[:, :, t:t + 1]), table,
            jnp.asarray([t], jnp.int32))

    q = (rng.standard_normal((b, h, 1, dh)) * 0.4).astype(np.float32)
    out = np.asarray(paged_mha_decode_step(
        jnp.asarray(q), pool_k, pool_v, table, jnp.asarray([3], jnp.int32)))

    cache_k, cache_v = init_kv_cache(b, h, tpb * mbs, dh)
    cache_k = cache_k.at[:, :, :3].set(k)
    cache_v = cache_v.at[:, :, :3].set(v)
    expect = np.asarray(mha_decode_step(
        jnp.asarray(q), cache_k, cache_v, jnp.asarray([3], jnp.int32)))
    np.testing.assert_allclose(out, expect, atol=3e-7, rtol=1e-6)
    assert np.all(np.abs(out) < 1e2)  # pool filler never bled through


def test_beam_width_context_alignment():
    """Beam sharing requires block-aligned context (the restriction the
    reference documents as a FIXME, kv_cache_manager.py:271-275); context
    blocks are shared across beams, generation growth diverges per beam."""
    cache = PagedKVCache(num_blocks=64, tokens_per_block=8,
                         max_blocks_per_seq=4, beam_width=2)
    with pytest.raises(ValueError, match="block-aligned"):
        cache.admit(5)
    assert len(cache) == 0  # failed admission left nothing behind
    cache.admit(8)
    table = cache.block_tables()
    assert table.shape == (1, 2, 4)
    # context block shared across beams at beam_width refs; the block
    # receiving the first GENERATED token is already private per beam
    # (beams write it divergently — the miswrite the reference's shared
    # reservation would allow)
    assert table[0, 0, 0] == table[0, 1, 0]
    assert cache.ledger.refcount(int(table[0, 0, 0])) == 2
    assert table[0, 0, 1] != table[0, 1, 1]
    assert cache.ledger.refcount(int(table[0, 0, 1])) == 1
    # generation-phase growth also diverges per beam
    for _ in range(7):
        cache.advance([False])  # len 8 -> 15, no boundary yet
    cache.advance([False])  # len 15 -> crosses: fresh per-beam blocks
    table = cache.block_tables()
    assert table[0, 0, 2] >= 0 and table[0, 1, 2] >= 0
    assert table[0, 0, 2] != table[0, 1, 2]
    assert table[0, 0, 0] == table[0, 1, 0]
    # retiring the row drops the shared block once and privates once each
    cache.advance([True])
    assert cache.ledger.free == 64


def test_reorder_beams_moves_refcounts():
    """Beam reorder re-parents block lists: adopted rows gain links, orphaned
    private tails return to the pool (the table half of the reference's
    cache_indirection ping-pong)."""
    cache = PagedKVCache(num_blocks=16, tokens_per_block=4,
                         max_blocks_per_seq=4, beam_width=2)
    cache.admit(4)  # col 0 shared context, col 1 per-beam private tails
    t0 = cache.block_tables()[0]
    priv0, priv1 = int(t0[0, 1]), int(t0[1, 1])
    assert priv0 != priv1
    free_before = cache.ledger.free
    cache.reorder_beams(0, [0, 0])  # beam 1 adopts beam 0's history
    t1 = cache.block_tables()[0]
    np.testing.assert_array_equal(t1[0], t1[1])
    assert cache.ledger.refcount(priv0) == 2
    assert cache.ledger.refcount(priv1) == 0  # orphaned, recycled
    assert cache.ledger.free == free_before + 1

    # fork_tail gives each beam a private tail again, reporting copy pairs
    pairs = cache.fork_tail(0)
    t2 = cache.block_tables()[0]
    assert t2[0, 1] != t2[1, 1]
    # exactly one beam kept the original (src==dst), one got a fresh dst
    kept = [tuple(p) for p in pairs if p[0] == p[1]]
    moved = [tuple(p) for p in pairs if p[0] != p[1]]
    assert len(kept) == 1 and len(moved) == 1
    assert moved[0][0] == priv0  # copy sourced from the shared tail
    assert cache.ledger.refcount(priv0) == 1
