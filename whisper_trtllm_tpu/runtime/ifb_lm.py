"""Token-level in-flight (continuous) batching for causal LMs.

Analog of the reference's GPT in-flight batching subsystem — the
ibGptAttentionPlugin (per-request cache lengths/pointers, reference:
cpp/tensorrt_llm/plugins/ibGptAttentionPlugin/), the
inflight_batching_gpt_attention graph op (reference:
tensorrt_llm/functional.py:2942) and the batch_manager callback protocol
(reference: cpp/tensorrt_llm/batch_manager/trtGptModelInflightBatching.h,
docs/in_flight_batching.md:16-50). Batch lanes hold *different requests at
different decode positions*; a finished lane is refilled from the queue
without waiting for its neighbors.

TPU-native shape: device state is static — per-lane integer positions
replace per-request pointer arrays, and every zoo family's ``_step`` already
accepts a (B,) position vector (per-lane cache writes + valid lengths).
Host↔device sync happens once per *segment* (a jitted run of up to
``segment_steps`` decode steps that early-exits when every lane finishes),
not per token. The whisper-specific variant (cross-KV lanes + logit
processors) is runtime/ifb.py; this one is generic over (prefill, step).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class LMLaneState(NamedTuple):
    tokens: jnp.ndarray     # (B, max_len)
    pos: jnp.ndarray        # (B,) index of last filled position
    plen: jnp.ndarray       # (B,) prompt length of the lane's request
    active: jnp.ndarray     # (B,)
    finished: jnp.ndarray   # (B,)
    cache_k: jnp.ndarray    # (L, B, H, max_len, dh)
    cache_v: jnp.ndarray


class CausalLMInflightBatcher:
    """Continuous-batching generation over fixed lanes for any zoo causal LM.

    >>> from whisper_trtllm_tpu.models.gpt import model as gm
    >>> b = CausalLMInflightBatcher(
    ...     params, cfg,
    ...     prefill=lambda p, t, l, ck, cv: gm._prefill_ragged(p, cfg, t, l, ck, cv),
    ...     step=lambda p, tok, pos, ck, cv: gm._step(p, cfg, tok, pos, ck, cv),
    ...     cache_heads=cfg.n_head, head_dim=cfg.head_dim,
    ...     n_layer=cfg.n_layer, eos_token_id=cfg.eos_token_id)
    >>> rid = b.submit([3, 4, 5])
    >>> b.run(); tokens = b.fetch(rid)
    """

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
        num_lanes: int = 8,
        max_prompt_len: int = 32,
        max_new_tokens: int = 64,
        segment_steps: int = 32,
    ):
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1 (the admit-time "
                             "first-token write needs one slot per request)")
        # device-resident weights (host numpy here re-uploads the tree on
        # every segment dispatch — see runtime/ifb.py)
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.eos = int(eos_token_id)
        self.num_lanes = num_lanes
        self.max_prompt_len = max_prompt_len
        self.max_len = max_prompt_len + max_new_tokens
        self.segment_steps = segment_steps
        self._prefill = prefill
        self._step = step

        shape = (n_layer, num_lanes, cache_heads, self.max_len, head_dim)
        self.max_new_tokens = max_new_tokens
        self.state = LMLaneState(
            tokens=jnp.full((num_lanes, self.max_len), self.eos, jnp.int32),
            pos=jnp.zeros((num_lanes,), jnp.int32),
            plen=jnp.zeros((num_lanes,), jnp.int32),
            active=jnp.zeros((num_lanes,), bool),
            finished=jnp.zeros((num_lanes,), bool),
            cache_k=jnp.zeros(shape, jnp.float32),
            cache_v=jnp.zeros(shape, jnp.float32),
        )
        self._queue: deque = deque()
        self._lane_req: List[Optional[int]] = [None] * num_lanes
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 1
        self._segment_fn = None
        self._admit_fn = None
        self._prefill_fn = None

    # -- jitted pieces (built once, cached on the instance) --------------------
    def _build(self):
        max_len, eos = self.max_len, self.eos
        n_lanes, seg = self.num_lanes, self.segment_steps
        p_max = self.max_prompt_len
        max_new = self.max_new_tokens
        step = self._step
        prefill = self._prefill
        rows = jnp.arange(n_lanes)

        def segment(params, state: LMLaneState) -> LMLaneState:
            def live_of(s):
                return s.active & ~s.finished

            def cond(carry):
                s, i = carry
                return jnp.logical_and(i < seg, jnp.any(live_of(s)))

            def body(carry):
                s, i = carry
                live = live_of(s)
                cur = s.tokens[rows, s.pos]
                logits, ck, cv = step(params, cur, s.pos, s.cache_k, s.cache_v)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt_pos = jnp.minimum(s.pos + 1, max_len - 1)
                existing = s.tokens[rows, nxt_pos]
                tokens = s.tokens.at[rows, nxt_pos].set(
                    jnp.where(live, nxt, existing))
                hit_eos = live & (nxt == eos)
                # per-request cap: tokens generated = nxt_pos - plen + 1
                hit_cap = live & (nxt_pos - s.plen + 1 >= max_new)
                hit_max = live & (nxt_pos >= max_len - 1)
                finished = s.finished | hit_eos | hit_cap | hit_max
                pos = jnp.where(live, nxt_pos, s.pos)
                return (LMLaneState(tokens, pos, s.plen, s.active, finished,
                                    ck, cv), i + 1)

            final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
            return final

        def prefill_one(params, prompt_row, plen):
            """prompt_row (1, p_max), plen (1,) → (first_logits (V,),
            ck/cv (L, 1, H, p_max, dh))."""
            shape_k = (self.state.cache_k.shape[0], 1,
                       self.state.cache_k.shape[2], p_max,
                       self.state.cache_k.shape[4])
            ck = jnp.zeros(shape_k, self.state.cache_k.dtype)
            cv = jnp.zeros(shape_k, self.state.cache_v.dtype)
            logits, ck, cv = prefill(params, prompt_row, plen, ck, cv)
            return logits[0], ck, cv

        def admit(state: LMLaneState, lane, prompt_row, plen, first_tok,
                  ck_new, cv_new) -> LMLaneState:
            lane = lane.astype(jnp.int32)
            zero = jnp.zeros((), jnp.int32)
            ck = jax.lax.dynamic_update_slice(
                state.cache_k, ck_new.astype(state.cache_k.dtype),
                (zero, lane, zero, zero, zero))
            cv = jax.lax.dynamic_update_slice(
                state.cache_v, cv_new.astype(state.cache_v.dtype),
                (zero, lane, zero, zero, zero))
            row = jnp.full((max_len,), eos, jnp.int32)
            row = jax.lax.dynamic_update_slice(row, prompt_row[0], (zero,))
            col = jnp.arange(max_len)
            row = jnp.where(col < plen[0], row, jnp.int32(eos))
            row = row.at[plen[0]].set(first_tok)
            tokens = jax.lax.dynamic_update_slice(
                state.tokens, row[None], (lane, zero))
            done0 = (first_tok == eos) | (max_new <= 1)
            return LMLaneState(
                tokens,
                state.pos.at[lane].set(plen[0]),
                state.plen.at[lane].set(plen[0]),
                state.active.at[lane].set(True),
                state.finished.at[lane].set(done0),
                ck, cv,
            )

        self._segment_fn = jax.jit(segment, donate_argnums=(1,))
        self._prefill_fn = jax.jit(prefill_one)
        self._admit_fn = jax.jit(admit, donate_argnums=(0,))

    # -- public -----------------------------------------------------------------
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

    def run(self, max_segments: int = 10_000) -> None:
        if self._segment_fn is None:
            self._build()
        for _ in range(max_segments):
            self._retire_and_admit()
            if not any(self._lane_req):
                if not self._queue:
                    return
                continue
            self.state = self._segment_fn(self.params, self.state)
            # pre-arm the host reads behind the running segment (same
            # overlap as runtime/ifb.py — the fixed D2H round-trip rides
            # the device compute instead of serializing after it)
            for arr in (self.state.finished, self.state.active,
                        self.state.tokens, self.state.pos):
                try:
                    arr.copy_to_host_async()
                except Exception:  # noqa: BLE001 — optional fast path
                    break
        raise RuntimeError("run() exceeded max_segments")

    # -- internals ----------------------------------------------------------------
    def _retire_and_admit(self) -> None:
        # one packed D2H window + one batched deactivation (per-lane
        # .at[].set dispatches pace the scheduler on high-latency
        # transports — same lesson as runtime/ifb.py)
        finished, active = jax.device_get(
            (self.state.finished, self.state.active))
        retire = [lane for lane in range(self.num_lanes)
                  if active[lane] and finished[lane]
                  and self._lane_req[lane] is not None]
        if retire:
            tokens, pos = jax.device_get((self.state.tokens, self.state.pos))
            keep = np.ones((self.num_lanes,), bool)
            for lane in retire:
                self._results[self._lane_req[lane]] = tokens[lane, : pos[lane] + 1]
                self._lane_req[lane] = None
                keep[lane] = False
            self.state = self.state._replace(
                active=self.state.active & jnp.asarray(keep))
        for lane in range(self.num_lanes):
            if self._lane_req[lane] is None and self._queue:
                rid, ids = self._queue.popleft()
                row = np.full((1, self.max_prompt_len), self.eos, np.int32)
                row[0, : ids.size] = ids
                plen = jnp.asarray([ids.size], jnp.int32)
                logits, ck, cv = self._prefill_fn(
                    self.params, jnp.asarray(row), plen)
                first = jnp.argmax(logits).astype(jnp.int32)
                self.state = self._admit_fn(
                    self.state, jnp.int32(lane), jnp.asarray(row), plen,
                    first, ck, cv)
                self._lane_req[lane] = rid
