"""Paged KV cache: host-side block manager scenarios (mirrors reference:
tests/test_kv_cache_manager.py) plus device-side numerics — paged attention
through block tables must equal the contiguous cache bit-for-bit on the same
tokens (the property the reference trusts its pointer plumbing to have but
never tests end-to-end)."""

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
    Block,
    BlocksManager,
    GenerationSequence,
    KVCacheManager,
)


def test_block_refcount():
    """(reference: tests/test_kv_cache_manager.py::test_block — minus the
    pointer accessors: blocks are pool indices here)."""
    block = Block(block_idx=7)
    block.add_link()
    assert block.ref_count == 1
    block.add_link()
    assert block.ref_count == 2 and block.has_link()
    block.remove_link()
    block.remove_link()
    assert block.ref_count == 0 and not block.has_link()
    assert block.idx == 7


def test_sequence_identity():
    """(reference: test_kv_cache_manager.py::test_sequence)."""
    seq = GenerationSequence(seq_idx=1, batch_idx=0)
    assert seq.get_batch_idx() == 0
    assert seq.get_seq_idx() == 1
    assert seq != GenerationSequence(seq_idx=1, batch_idx=1)
    assert seq == GenerationSequence(seq_idx=1, batch_idx=0)
    assert seq != GenerationSequence(seq_idx=0, batch_idx=0)


def _allocate_all(manager, sequences, block_len):
    for _ in range(block_len):
        for seq in sequences:
            assert manager.has_free_block()
            manager.allocate(seq)
    assert not manager.has_free_block()


def _verify_table(manager, sequences, block_len, max_blocks_per_seq):
    table = manager.get_block_table()
    assert table.shape == (len(sequences), 1, max_blocks_per_seq)
    # round-robin allocation order ⇒ lane b's i-th block has pool index
    # i*len(sequences)+b (the index analog of the reference's
    # verify_pointer_array address arithmetic)
    for seq in sequences:
        b = seq.get_batch_idx()
        for i in range(max_blocks_per_seq):
            expect = i * len(sequences) + b if i < block_len else -1
            assert table[b, 0, i] == expect


def test_blocks_manager_allocate_free():
    """(reference: test_kv_cache_manager.py::test_blocks_manager_single_pool
    — table-index form; the multi-pool variant collapses away because one
    index addresses every layer's pools)."""
    max_seq, max_blocks_per_seq = 8, 8
    sequences = [GenerationSequence(seq_idx=i, batch_idx=i)
                 for i in range(max_seq)]
    manager = BlocksManager(blocks=max_seq * max_blocks_per_seq,
                            max_blocks_per_seq=max_blocks_per_seq)
    assert len(manager.free_blocks) == max_seq * max_blocks_per_seq

    _allocate_all(manager, sequences, max_blocks_per_seq)
    _verify_table(manager, sequences, max_blocks_per_seq, max_blocks_per_seq)
    for seq in sequences:
        manager.free(seq)
        assert len(manager.free_blocks) == \
            (seq.get_batch_idx() + 1) * max_blocks_per_seq

    # 2x sequences with half the blocks each
    manager = BlocksManager(blocks=max_seq * max_blocks_per_seq,
                            max_blocks_per_seq=max_blocks_per_seq)
    sequences_2x = [GenerationSequence(seq_idx=i, batch_idx=i)
                    for i in range(2 * max_seq)]
    _allocate_all(manager, sequences_2x, max_blocks_per_seq // 2)
    _verify_table(manager, sequences_2x, max_blocks_per_seq // 2,
                  max_blocks_per_seq)

    # exhaustion raises (the admission-control signal IFB acts on)
    manager = BlocksManager(blocks=max_seq * max_blocks_per_seq,
                            max_blocks_per_seq=max_blocks_per_seq)
    _allocate_all(manager, sequences, max_blocks_per_seq)
    with pytest.raises(RuntimeError, match="Can't allocate new block"):
        manager.allocate(sequences[0])


def test_blocks_manager_beam_sharing():
    """(reference: test_kv_cache_manager.py::test_blocks_manager_beam)."""
    beam_width = 4
    blocks = 32
    manager = BlocksManager(blocks=blocks, max_blocks_per_seq=8,
                            beam_width=beam_width)
    s0 = GenerationSequence(seq_idx=0, batch_idx=0)
    s1 = GenerationSequence(seq_idx=1, batch_idx=1)

    manager.allocate(s0, share_across_beam=True)
    beams = manager.allocated_blocks[s0]
    assert beams[0][0].idx == beams[1][0].idx == beams[2][0].idx \
        == beams[3][0].idx
    assert beams[1][0].ref_count == beam_width

    manager.allocate(s1, share_across_beam=False)
    beams = manager.allocated_blocks[s1]
    idxs = {beams[bi][0].idx for bi in range(beam_width)}
    assert len(idxs) == beam_width
    assert all(beams[bi][0].ref_count == 1 for bi in range(beam_width))

    manager.free(s1)
    assert len(manager.free_blocks) == blocks - 1  # shared block still held
    manager.free(s0)
    assert len(manager.free_blocks) == blocks


def test_kv_cache_manager_lifecycle():
    """Step/retire/compact scenario (reference:
    test_kv_cache_manager.py::test_kv_cache_manager, same lens 30/35/31 and
    tokens_per_block=32)."""
    manager = KVCacheManager(blocks=128, tokens_per_block=32,
                             max_blocks_per_seq=16)
    manager.add_sequence(GenerationSequence(seq_idx=0, batch_idx=0), 30)
    manager.add_sequence(GenerationSequence(seq_idx=1, batch_idx=1), 35)
    manager.add_sequence(GenerationSequence(seq_idx=2, batch_idx=2), 31)

    def blocks_of(table, b):
        return int((table[b, 0] >= 0).sum())

    table = manager.get_block_tables()
    assert [blocks_of(table, b) for b in range(3)] == [1, 2, 1]
    assert manager.lens == [30, 35, 31]

    for _ in range(3):
        manager.step([False, False, False])
    table = manager.get_block_tables()
    assert [blocks_of(table, b) for b in range(3)] == [2, 2, 2]
    assert manager.lens == [33, 38, 34]

    # retire the middle sequence: batch indices compact, lens shift
    manager.step([False, True, False])
    assert len(manager.sequences) == 2 and manager.lens == [34, 35]
    table = manager.get_block_tables()
    assert table.shape[0] == 2
    assert [blocks_of(table, b) for b in range(2)] == [2, 2]

    manager.step([False, True])
    assert len(manager.sequences) == 1 and manager.lens == [35]
    assert blocks_of(manager.get_block_tables(), 0) == 2

    # freed blocks actually return to the pool
    free0 = len(manager.blocks_manager.free_blocks)
    manager.step([True])
    assert len(manager.blocks_manager.free_blocks) > free0
    assert manager.sequences == [] and manager.lens == []


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
    manager-driven block growth — paged attention must equal the contiguous
    cache exactly (same dtype, same masked-softmax path)."""
    b, h, dh, tpb, mbs = 2, 2, 8, 4, 4
    tmax = tpb * mbs
    ctx = [5, 3]
    steps = 6

    manager = KVCacheManager(blocks=10, tokens_per_block=tpb,
                             max_blocks_per_seq=mbs)
    for i, n in enumerate(ctx):
        manager.add_sequence(GenerationSequence(seq_idx=i, batch_idx=i), n)

    k_ctx = (rng.standard_normal((b, h, max(ctx), dh)) * 0.4).astype(np.float32)
    v_ctx = rng.standard_normal((b, h, max(ctx), dh)).astype(np.float32)

    pool_k, pool_v = init_paged_kv_cache(10, tpb, h, dh)
    table = manager.get_block_tables()[:, 0]
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

        table = manager.get_block_tables()[:, 0]
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

        manager.step([False] * b)
        assert manager.lens == list(lens)


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
    """Beam sharing requires block-aligned context (the reference's
    documented FIXME restriction, kv_cache_manager.py:271-275)."""
    manager = KVCacheManager(blocks=64, tokens_per_block=8,
                             max_blocks_per_seq=4, beam_width=2)
    with pytest.raises(AssertionError):
        manager.add_sequence(GenerationSequence(seq_idx=0, batch_idx=0), 5)
    manager.add_sequence(GenerationSequence(seq_idx=1, batch_idx=0), 8)
    table = manager.get_block_tables()
    assert table.shape == (1, 2, 4)
    # context blocks shared across beams
    np.testing.assert_array_equal(table[0, 0], table[0, 1])
    # generation-phase growth diverges per beam
    manager.step([False])  # len 8 -> 9, no boundary yet (9 % 8 != 7)
    for _ in range(6):
        manager.step([False])
    manager.step([False])  # len 15 -> crosses: fresh per-beam blocks
    table = manager.get_block_tables()
    assert table[0, 0, 2] >= 0 and table[0, 1, 2] >= 0
    assert table[0, 0, 2] != table[0, 1, 2]
    assert (table[0, 0, :2] == table[0, 1, :2]).all()
