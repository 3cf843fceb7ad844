"""Paged-KV continuous batching for causal LMs.

The reference pairs its in-flight batcher with the paged KV cache: the
batch_manager admits requests only while KVCacheManager can supply blocks,
and the attention plugin consumes per-request block-pointer arrays
(reference: cpp/tensorrt_llm/batch_manager/trtGptModelInflightBatching.h,
tensorrt_llm/runtime/generation.py:842-855,977-988 paged hooks,
docs/gpt_attention.md paged KV section). This module is that pairing on
TPU: `runtime/ifb_lm.py`'s fixed-lane segment loop + the block-table paged
attention ops (ops/attention.py) + the refcounted BlockLedger
(runtime/kv_cache_manager.py).

What paging buys over the dense batcher: lanes no longer reserve
`max_len` KV rows up front — HBM holds one shared pool sized to the
*expected working set*, admission is gated on free blocks (memory-based
backpressure, the reference's scheduling signal), and short requests
release their blocks the moment they retire.

One host/device split is different from the reference by necessity: the
reference's generation loop is host-driven, so KVCacheManager.step() can
allocate a block the very token it is needed. Our segment loop runs many
steps inside one jit (host sync once per segment), so block allocation is
*reserved ahead*: before each segment every live lane gets enough blocks to
cover `segment_steps` more tokens (freed again at retirement). The cost is
bounded over-reservation (< segment_steps/tokens_per_block blocks per lane);
the win is no per-token host round-trip.
"""

from __future__ import annotations

import math
from collections import deque
from typing import Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.runtime.kv_cache_manager import BlockLedger


class PagedLaneState(NamedTuple):
    tokens: jnp.ndarray     # (B, max_len)
    pos: jnp.ndarray        # (B,) index of last filled position
    plen: jnp.ndarray       # (B,) prompt length
    active: jnp.ndarray     # (B,)
    finished: jnp.ndarray   # (B,)
    pool_k: jnp.ndarray     # (L, num_blocks, tpb, H, dh)
    pool_v: jnp.ndarray


class PagedCausalLMInflightBatcher:
    """Continuous batching over a shared paged KV pool.

    ``prefill``/``step`` are the model's paged phases, e.g. for GPT:
    ``models/gpt/model.py::_prefill_paged`` (params, tokens(1,P), lens(1,),
    pool_k, pool_v, table(1,M)) and ``_step_paged`` (params, tok(B,),
    pos(B,), pool_k, pool_v, tables(B,M))."""

    def __init__(
        self,
        params: dict,
        cfg,
        prefill: Callable,
        step: Callable,
        cache_heads: int,
        head_dim: int,
        n_layer: int,
        eos_token_id: int,
        num_blocks: int,
        tokens_per_block: int = 16,
        num_lanes: int = 4,
        max_prompt_len: int = 32,
        max_new_tokens: int = 64,
        segment_steps: int = 32,
        dtype=jnp.float32,
    ):
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        # device-resident weights (host numpy here re-uploads the tree on
        # every segment dispatch — see runtime/ifb.py)
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.eos = int(eos_token_id)
        self.num_lanes = num_lanes
        self.max_prompt_len = max_prompt_len
        self.max_len = max_prompt_len + max_new_tokens
        self.max_new_tokens = max_new_tokens
        self.segment_steps = segment_steps
        self.tpb = tokens_per_block
        self.max_blocks_per_seq = math.ceil(self.max_len / tokens_per_block)
        self._prefill = prefill
        self._step = step

        self.ledger = BlockLedger(num_blocks)
        # lane -> host block-table row; -1 everywhere when the lane is free,
        # so a retired lane's in-flight writes drop at the scatter
        self._tables = np.full(
            (num_lanes, self.max_blocks_per_seq), -1, np.int32)
        self._owned = np.zeros(num_lanes, np.int32)

        pool_shape = (n_layer, num_blocks, tokens_per_block,
                      cache_heads, head_dim)
        self.state = PagedLaneState(
            tokens=jnp.full((num_lanes, self.max_len), self.eos, jnp.int32),
            pos=jnp.zeros((num_lanes,), jnp.int32),
            plen=jnp.zeros((num_lanes,), jnp.int32),
            active=jnp.zeros((num_lanes,), bool),
            finished=jnp.zeros((num_lanes,), bool),
            pool_k=jnp.zeros(pool_shape, dtype),
            pool_v=jnp.zeros(pool_shape, dtype),
        )
        self._queue: deque = deque()
        self._lane_req: List[Optional[int]] = [None] * num_lanes
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 1
        self._segment_fn = None
        self._prefill_fn = None
        self._admit_fn = None

    # -- jitted pieces ---------------------------------------------------------
    def _build(self):
        max_len, eos = self.max_len, self.eos
        n_lanes = self.num_lanes
        p_max = self.max_prompt_len
        max_new = self.max_new_tokens
        step = self._step
        prefill = self._prefill
        rows = jnp.arange(n_lanes)

        def segment(params, state: PagedLaneState, tables, nsteps):
            """Up to ``nsteps`` lockstep decode steps (dynamic bound: the
            host shrinks it to the block coverage it managed to reserve,
            without recompiling)."""
            def live_of(s):
                return s.active & ~s.finished

            def cond(carry):
                s, i = carry
                return jnp.logical_and(i < nsteps, jnp.any(live_of(s)))

            def body(carry):
                s, i = carry
                live = live_of(s)
                cur = s.tokens[rows, s.pos]
                logits, pk, pv = step(params, cur, s.pos, s.pool_k, s.pool_v,
                                      tables)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt_pos = jnp.minimum(s.pos + 1, max_len - 1)
                existing = s.tokens[rows, nxt_pos]
                tokens = s.tokens.at[rows, nxt_pos].set(
                    jnp.where(live, nxt, existing))
                hit_eos = live & (nxt == eos)
                hit_cap = live & (nxt_pos - s.plen + 1 >= max_new)
                hit_max = live & (nxt_pos >= max_len - 1)
                finished = s.finished | hit_eos | hit_cap | hit_max
                pos = jnp.where(live, nxt_pos, s.pos)
                return (PagedLaneState(tokens, pos, s.plen, s.active,
                                       finished, pk, pv), i + 1)

            final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
            return final

        def prefill_one(params, prompt_row, plen, pool_k, pool_v, table_row):
            logits, pool_k, pool_v = prefill(
                params, prompt_row, plen, pool_k, pool_v, table_row)
            return logits[0], pool_k, pool_v

        def admit(state: PagedLaneState, lane, prompt_row, plen,
                  first_tok) -> PagedLaneState:
            lane = lane.astype(jnp.int32)
            zero = jnp.zeros((), jnp.int32)
            row = jnp.full((max_len,), eos, jnp.int32)
            row = jax.lax.dynamic_update_slice(row, prompt_row[0], (zero,))
            col = jnp.arange(max_len)
            row = jnp.where(col < plen[0], row, jnp.int32(eos))
            row = row.at[plen[0]].set(first_tok)
            tokens = jax.lax.dynamic_update_slice(
                state.tokens, row[None], (lane, zero))
            done0 = (first_tok == eos) | (max_new <= 1)
            return PagedLaneState(
                tokens,
                state.pos.at[lane].set(plen[0]),
                state.plen.at[lane].set(plen[0]),
                state.active.at[lane].set(True),
                state.finished.at[lane].set(done0),
                state.pool_k, state.pool_v,
            )

        self._segment_fn = jax.jit(segment, donate_argnums=(1,))
        self._prefill_fn = jax.jit(prefill_one, donate_argnums=(3, 4))
        self._admit_fn = jax.jit(admit, donate_argnums=(0,))

    # -- host-side block bookkeeping --------------------------------------------
    def _blocks_of(self, lane: int) -> int:
        return int(self._owned[lane])

    def _grow(self, lane: int, want_blocks: int) -> None:
        """Take blocks for ``lane`` until it owns ``want_blocks`` (or the
        pool runs dry) — PagedKVCache.advance()'s boundary-crossing growth
        at segment granularity."""
        want_blocks = min(want_blocks, self.max_blocks_per_seq)
        have = int(self._owned[lane])
        n = min(want_blocks - have, self.ledger.free)
        if n > 0:
            self._tables[lane, have:have + n] = self.ledger.take(n)
            self._owned[lane] = have + n

    def _free_lane(self, lane: int) -> None:
        have = int(self._owned[lane])
        if have:
            self.ledger.unref(self._tables[lane, :have])
        self._tables[lane, :] = -1
        self._owned[lane] = 0

    # -- public ------------------------------------------------------------------
    def submit(self, prompt_ids) -> int:
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if not (0 < ids.size <= self.max_prompt_len):
            raise ValueError(
                f"prompt length {ids.size} not in [1, {self.max_prompt_len}]")
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, ids))
        return rid

    def fetch(self, request_id: int) -> Optional[np.ndarray]:
        return self._results.pop(request_id, None)

    def free_blocks(self) -> int:
        return self.ledger.free

    def run(self, max_segments: int = 10_000) -> None:
        if self._segment_fn is None:
            self._build()
        for _ in range(max_segments):
            self._retire_and_admit()
            if not any(self._lane_req):
                if not self._queue:
                    return
                continue
            nsteps = self._reserve_segment()
            self.state = self._segment_fn(
                self.params, self.state, jnp.asarray(self._tables),
                jnp.int32(nsteps))
        raise RuntimeError("run() exceeded max_segments")

    # -- internals ----------------------------------------------------------------
    def _reserve_segment(self) -> int:
        """Grow every live lane's table to cover up to ``segment_steps`` more
        tokens; return the step count every lane is covered for."""
        # one packed D2H window (see runtime/ifb.py)
        active, finished, pos, plen = jax.device_get(
            (self.state.active, self.state.finished, self.state.pos,
             self.state.plen))
        nsteps = self.segment_steps
        for lane in range(self.num_lanes):
            if not (active[lane] and not finished[lane]):
                continue
            # tokens already stored: pos+1. Never reserve past what the
            # per-request cap can write (plen + max_new tokens).
            lane_cap = min(int(plen[lane]) + self.max_new_tokens,
                           self.max_len)
            target = min(int(pos[lane]) + 1 + self.segment_steps, lane_cap)
            self._grow(lane, math.ceil(target / self.tpb))
            covered = self._blocks_of(lane) * self.tpb
            lane_steps = covered - (int(pos[lane]) + 1)
            # a lane at max_len-1 only rewrites its last slot; never stalls
            if int(pos[lane]) >= self.max_len - 1:
                continue
            nsteps = min(nsteps, lane_steps)
        if nsteps < 1:
            raise RuntimeError(
                "paged KV pool exhausted mid-request: no lane can advance "
                "and nothing can retire — size num_blocks for at least "
                "num_lanes * ceil(max_len/tokens_per_block) worst case, or "
                "lower num_lanes")
        return nsteps

    def _retire_and_admit(self) -> None:
        finished, active = jax.device_get(
            (self.state.finished, self.state.active))
        tokens = pos = None
        for lane in range(self.num_lanes):
            if active[lane] and finished[lane] and self._lane_req[lane] is not None:
                if tokens is None:
                    tokens, pos = jax.device_get(
                        (self.state.tokens, self.state.pos))
                self._results[self._lane_req[lane]] = tokens[lane, : pos[lane] + 1]
                self._lane_req[lane] = None
                self._free_lane(lane)
                self.state = self.state._replace(
                    active=self.state.active.at[lane].set(False))
        for lane in range(self.num_lanes):
            if self._lane_req[lane] is None and self._queue:
                rid, ids = self._queue[0]
                # admission control: context blocks (+1 token) must be
                # available NOW or the request waits (the reference
                # batch_manager's maxNumRequests/KV-capacity gating)
                need = math.ceil((ids.size + 1) / self.tpb)
                if self.ledger.free < need:
                    break
                self._queue.popleft()
                self._grow(lane, need)
                row = np.full((1, self.max_prompt_len), self.eos, np.int32)
                row[0, : ids.size] = ids
                plen = jnp.asarray([ids.size], jnp.int32)
                logits, pk, pv = self._prefill_fn(
                    self.params, jnp.asarray(row), plen,
                    self.state.pool_k, self.state.pool_v,
                    jnp.asarray(self._tables[lane:lane + 1]))
                first = jnp.argmax(logits).astype(jnp.int32)
                self.state = self.state._replace(pool_k=pk, pool_v=pv)
                self.state = self._admit_fn(
                    self.state, jnp.int32(lane), jnp.asarray(row), plen,
                    first)
                self._lane_req[lane] = rid
