"""Paged KV-cache manager: a block pool with refcounted, beam-shareable
blocks and per-sequence block tables.

Analog of the reference's paged KV cache (reference:
tensorrt_llm/runtime/kv_cache_manager.py — Block:8, BlocksManager:58,
KVCacheManager:214; consumed by the gptAttention plugin's paged_kv_cache
mode via per-sequence pointer arrays, tensorrt_llm/runtime/generation.py:
842-855,977-988). One deliberate inversion for TPU: the reference hands the
kernel raw device *pointer* arrays (int64 addresses into per-layer pools);
XLA has no pointers, so the device-visible artifact here is a block *table*
of int32 pool indices, consumed by a gather in the paged attention op
(ops/attention.py::paged_mha_decode_step / paged_update_kv_cache). Same
management logic (free-list, refcounts, beam sharing of context blocks,
boundary-crossing allocation in step()), different addressing.

The manager is host-side Python in both frameworks: it runs between jitted
decode segments, and its tables enter the graph as ordinary int32 device
arrays — no recompilation, because table *shapes* are static
(max_blocks_per_seq).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List

import numpy as np


class Block:
    """One pool block with a reference count (reference: Block,
    tensorrt_llm/runtime/kv_cache_manager.py:8-29 — minus the k/v pointer
    pairs: a block is identified by its pool index alone here, and K/V live
    in two same-shape pools indexed identically)."""

    def __init__(self, block_idx: int):
        self.idx = block_idx
        self.ref_count = 0

    def add_link(self):
        self.ref_count += 1

    def remove_link(self):
        self.ref_count -= 1

    def has_link(self) -> bool:
        return self.ref_count > 0


class GenerationSequence:
    """(reference: GenerationSequence, kv_cache_manager.py:32-55)"""

    def __init__(self, seq_idx: int, batch_idx: int):
        self.seq_idx = seq_idx
        self.batch_idx = batch_idx

    def get_batch_idx(self) -> int:
        return self.batch_idx

    def get_seq_idx(self) -> int:
        return self.seq_idx

    def __eq__(self, other):
        return (hasattr(other, "seq_idx") and self.seq_idx == other.seq_idx
                and hasattr(other, "batch_idx")
                and self.batch_idx == other.batch_idx)

    def __hash__(self):
        return self.seq_idx


class BlocksManager:
    """Free-list block allocator with beam-shared refcounting (reference:
    BlocksManager, kv_cache_manager.py:58-212). No memory pools here — pool
    arrays are owned by the model session as jax arrays; this class only
    hands out indices into them."""

    def __init__(self, blocks: int, max_blocks_per_seq: int = 128,
                 beam_width: int = 1):
        self.blocks = blocks
        self.max_blocks_per_seq = max_blocks_per_seq
        self.beam_width = beam_width
        self.free_blocks: List[Block] = [Block(bi) for bi in range(blocks)]
        self.allocated_blocks = defaultdict(
            lambda: [[] for _ in range(self.beam_width)])

    def has_free_block(self) -> bool:
        return len(self.free_blocks) > 0

    def allocate(self, owner: GenerationSequence,
                 share_across_beam: bool = False):
        """Append one block per beam to ``owner`` (a single shared block when
        share_across_beam — the context-phase path)."""
        block = None
        for bi in range(self.beam_width):
            if not self.has_free_block():
                raise RuntimeError("Can't allocate new block for KV cache")
            if block is None or not share_across_beam:
                block = self.free_blocks.pop(0)
            block.add_link()
            self.allocated_blocks[owner][bi].append(block)

    def free(self, owner: GenerationSequence):
        """Unlink all of ``owner``'s blocks; zero-ref blocks return to the
        free list; the owner is forgotten."""
        for bi in range(self.beam_width):
            for block in self.allocated_blocks[owner][bi]:
                block.remove_link()
                if not block.has_link():
                    self.free_blocks.append(block)
        self.allocated_blocks.pop(owner)

    def get_number_blocks(self, owner: GenerationSequence) -> int:
        return len(self.allocated_blocks[owner][0])

    def get_block_table(self) -> np.ndarray:
        """(num_sequences, beam_width, max_blocks_per_seq) int32 of pool
        indices, -1 where unallocated — the gather-table analog of the
        reference's (B, beam, 2, max_blocks) int64 pointer array
        (kv_cache_manager.py:154-175; no K/V axis: the same index addresses
        both pools)."""
        table = np.full(
            (len(self.allocated_blocks), self.beam_width,
             self.max_blocks_per_seq), -1, np.int32)
        for owner, beams in self.allocated_blocks.items():
            for bi in range(self.beam_width):
                for li, block in enumerate(beams[bi]):
                    table[owner.get_batch_idx(), bi, li] = block.idx
        return table


class KVCacheManager:
    """Sequence lifecycle over a BlocksManager (reference: KVCacheManager,
    kv_cache_manager.py:214-292): add_sequence allocates context blocks
    (beam-shared), step() grows sequences across block boundaries and
    retires finished ones, remapping batch indices compactly."""

    def __init__(self, blocks: int, tokens_per_block: int,
                 max_blocks_per_seq: int, beam_width: int = 1):
        self.blocks_manager = BlocksManager(
            blocks=blocks, max_blocks_per_seq=max_blocks_per_seq,
            beam_width=beam_width)
        self.tokens_per_block = tokens_per_block
        self.beam_width = beam_width
        self.lens: List[int] = []
        self.sequences: List[GenerationSequence] = []

    def step(self, finished: List[bool]):
        """Advance every live sequence by one token: allocate a fresh block
        for any sequence whose next token crosses a block boundary, free
        finished sequences, compact batch indices."""
        for seq in self.sequences:
            bi = seq.get_batch_idx()
            if (not finished[bi] and self.lens[bi] % self.tokens_per_block
                    == self.tokens_per_block - 1):
                self.blocks_manager.allocate(seq)
            self.lens[bi] += 1

        for fi, fin in enumerate(finished):
            if fin:
                self.blocks_manager.free(self.sequences[fi])
        self.lens = [l for l, f in zip(self.lens, finished) if not f]

        new_sequences = []
        batch_idx = 0
        for seq, fin in zip(self.sequences, finished):
            if not fin:
                seq.batch_idx = batch_idx
                new_sequences.append(seq)
                batch_idx += 1
        self.sequences = new_sequences

    def add_sequence(self, sequence: GenerationSequence, context_len: int):
        """Admit a sequence, allocating enough beam-shared blocks for its
        context plus the first generated token (kv_cache_manager.py:263-280,
        including its beam-alignment restriction)."""
        # context blocks are shared across beams; a partial tail block would
        # be written divergently by each beam in the generation phase.
        # Validated BEFORE mutating (the reference appends first,
        # kv_cache_manager.py:268-275, leaving a phantom sequence behind a
        # failed admission).
        assert self.beam_width == 1 or (
            self.beam_width > 1
            and context_len % self.tokens_per_block == 0)
        self.lens.append(context_len)
        self.sequences.append(sequence)
        context_blocks = math.ceil((context_len + 1) / self.tokens_per_block)
        for _ in range(context_blocks):
            self.blocks_manager.allocate(sequence, share_across_beam=True)

    def get_block_tables(self) -> np.ndarray:
        """(num_sequences, beam_width, max_blocks_per_seq) int32 — feed
        directly (or a [:, 0] slice for beam_width 1) to
        ops.attention.paged_mha_decode_step / paged_update_kv_cache."""
        return self.blocks_manager.get_block_table()
