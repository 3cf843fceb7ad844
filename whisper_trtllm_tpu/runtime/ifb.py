"""Token-level in-flight (continuous) batching.

Analog of the reference's in-flight batching subsystem
(reference: cpp/tensorrt_llm/batch_manager/trtGptModelInflightBatching.h,
ibGptAttentionPlugin, protocol docs/in_flight_batching.md:16-50): batch lanes
hold *different utterances at different decode positions*; a finished lane is
refilled from the queue without waiting for its neighbors. Device state stays
shape-static — per-lane integer positions do the work of the reference's
per-request cache pointer arrays.

Host↔device sync happens once per *segment* (a jitted run of up to
``segment_steps`` decode steps that early-exits when every lane is done),
not per token — and the segment's lane flags are streamed to the host with
``copy_to_host_async`` as soon as the segment is dispatched, so on
transports with high fixed round-trip latency the D2H ride overlaps the
device compute instead of serializing after it (VERDICT r4 order 6).

Cache precision is pluggable like the lockstep path: pass a
``GenerationConfig`` with ``kv_cache_dtype="int8"``/``"fp8"`` and the lanes
store quantized 4-tuple caches with the T-minor cross layout (the measured
serving precision, docs/PERFORMANCE.md) — previously the in-flight backend
silently decoded bf16-KV whatever the caller asked (ADVICE r4).
"""

from __future__ import annotations

import functools
import os
from collections import deque
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import model as wmodel
from whisper_trtllm_tpu.runtime import logits_process as lp
from whisper_trtllm_tpu.runtime.generation import (
    apply_cross_layout,
    kv_quant_dtype,
)


class LaneState(NamedTuple):
    tokens: jnp.ndarray     # (B, max_len)
    pos: jnp.ndarray        # (B,) index of last filled position
    active: jnp.ndarray     # (B,) lane holds a request
    finished: jnp.ndarray   # (B,) request hit EOS / max length
    self_kv: Tuple[jnp.ndarray, ...]    # float 2-tuple or quantized 4-tuple
    cross_kv: Tuple[jnp.ndarray, ...]   # (L, B, H, Tc, dh) tuple (or T-minor)


@functools.lru_cache(maxsize=8)
def _compiled_segment(cfg: WhisperConfig, max_len: int, segment_steps: int):
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)
    forced_map, begin_index = lp.build_forced_map(cfg, max_len)

    def segment(params, state: LaneState) -> LaneState:
        sup = jnp.asarray(suppress_mask)
        beg = jnp.asarray(begin_mask)
        forced = jnp.asarray(forced_map)

        def should_step(s):
            return s.active & ~s.finished

        def cond(carry):
            s, i = carry
            return jnp.logical_and(i < segment_steps, jnp.any(should_step(s)))

        def body(carry):
            s, i = carry
            live = should_step(s)
            cur = jnp.take_along_axis(s.tokens, s.pos[:, None], axis=1)[:, 0]
            logits, new_self = wmodel.decode_step_ragged_kv(
                params, cfg, cur, s.pos, s.self_kv, s.cross_kv,
            )
            nxt_pos = jnp.minimum(s.pos + 1, max_len - 1)
            logits = logits + sup[None]
            logits = jnp.where(
                (nxt_pos == begin_index)[:, None], logits + beg[None], logits
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            f = forced[nxt_pos]
            nxt = jnp.where(f >= 0, f, nxt)
            existing = jnp.take_along_axis(s.tokens, nxt_pos[:, None], axis=1)[:, 0]
            val = jnp.where(live, nxt, existing)
            tokens = jax.vmap(
                lambda row, p, v: row.at[p].set(v)
            )(s.tokens, nxt_pos, val)
            hit_eos = live & (nxt == cfg.eos_token_id)
            hit_max = live & (nxt_pos >= max_len - 1)
            finished = s.finished | hit_eos | hit_max
            pos = jnp.where(live, nxt_pos, s.pos)
            return (LaneState(tokens, pos, s.active, finished, new_self,
                              s.cross_kv), i + 1)

        final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
        return final

    return jax.jit(segment, donate_argnums=(1,))


@functools.lru_cache(maxsize=8)
def _compiled_admit(cfg: WhisperConfig, max_len: int):
    """Insert a new utterance's cross-KV into one lane and reset lane state.

    Generic over the cross tuple arity/layout: every leaf is a rank-5
    (L, B, ...) array and the new utterance arrives with the lane axis
    dropped, so one dynamic_update_slice per leaf covers float, quantized
    and T-minor caches alike."""

    def admit(state: LaneState, lane, new_cross) -> LaneState:
        lane = lane.astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        cross = tuple(
            jax.lax.dynamic_update_slice(
                cur, new[:, None], (zero, lane, zero, zero, zero)
            )
            for cur, new in zip(state.cross_kv, new_cross)
        )
        row = jnp.full((max_len,), cfg.pad_token_id, jnp.int32).at[0].set(
            cfg.decoder_start_token_id
        )
        tokens = jax.lax.dynamic_update_slice(state.tokens, row[None], (lane, zero))
        pos = state.pos.at[lane].set(0)
        active = state.active.at[lane].set(True)
        finished = state.finished.at[lane].set(False)
        return LaneState(tokens, pos, active, finished,
                         state.self_kv, cross)

    return jax.jit(admit, donate_argnums=(0,))


class InflightBatcher:
    """Continuous-batching decoder over fixed lanes.

    >>> b = InflightBatcher(params, cfg, num_lanes=8)
    >>> rid = b.submit(mel_1x3000xM)       # any number of times
    >>> b.run()                            # drain queue + lanes
    >>> tokens = b.fetch(rid)
    """

    def __init__(
        self,
        params: dict,
        cfg: WhisperConfig,
        generation: Optional[GenerationConfig] = None,
        num_lanes: int = 8,
        segment_steps: int = 32,
        adaptive_segments: bool = True,
    ):
        gen = generation or GenerationConfig()
        self.cfg = cfg
        # pin weights on device: callers (cli/serve.py hands over raw
        # checkpoint numpy) must not leave them host-resident, or EVERY
        # _segment dispatch re-uploads the full weight tree — measured as
        # 5.5 s/segment (vs 0.044 s device-resident) behind the 45 MB/s
        # dev tunnel, the entire round-4 ifb load-test pathology
        self.params = jax.device_put(params)
        self.num_lanes = num_lanes
        self.segment_steps = segment_steps
        self.max_len = min(cfg.max_target_positions, gen.max_new_tokens + 1)
        kv_qdtype = kv_quant_dtype(gen.kv_cache_dtype)
        layout = gen.cross_kv_layout

        # encode + cross-KV prep (quantize + layout) in ONE jitted dispatch
        def encode_cross(p, m):
            ck, cv = wmodel.compute_cross_kv(p, cfg, wmodel.encode(p, cfg, m))
            cross = ((ck, cv) if kv_qdtype is None
                     else wmodel.quantize_cross_kv(ck, cv, kv_qdtype))
            return apply_cross_layout(cross, layout)

        self._encode = jax.jit(encode_cross)
        self._segment = _compiled_segment(cfg, self.max_len, segment_steps)
        # adaptive segmentation (VERDICT r4 order 6): while requests WAIT in
        # the queue, long segments leave finished lanes idle until the next
        # host sync — a short segment bounds time-to-admit; once the queue
        # is empty the long segment amortizes the per-call fixed cost.
        # Token outputs are segmentation-invariant (the loop early-exits on
        # lane completion), so this is purely a scheduling knob.
        self._short_steps = max(4, segment_steps // 4)
        self._segment_short = (
            _compiled_segment(cfg, self.max_len, self._short_steps)
            if adaptive_segments and self._short_steps < segment_steps
            else None)
        self._admit = _compiled_admit(cfg, self.max_len)

        if kv_qdtype is None:
            self_kv = wmodel.init_self_kv(cfg, num_lanes, self.max_len)
        else:
            self_kv = wmodel.init_self_kv_quant(cfg, num_lanes, self.max_len,
                                                kv_qdtype)
        cross_probe = jax.eval_shape(
            self._encode, params,
            jax.ShapeDtypeStruct(
                (1, 2 * cfg.max_source_positions, cfg.num_mel_bins), jnp.float32
            ),
        )
        self.state = LaneState(
            tokens=jnp.full((num_lanes, self.max_len), cfg.pad_token_id, jnp.int32),
            pos=jnp.zeros((num_lanes,), jnp.int32),
            active=jnp.zeros((num_lanes,), bool),
            finished=jnp.zeros((num_lanes,), bool),
            self_kv=self_kv,
            cross_kv=tuple(
                jnp.zeros((c.shape[0], num_lanes) + c.shape[2:], c.dtype)
                for c in cross_probe
            ),
        )
        self._queue: deque = deque()
        self._lane_req: List[Optional[int]] = [None] * num_lanes
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 1
        # double-buffered scheduling (opt-in, A/B via env): dispatch
        # segment N+1 before consuming N's host outputs. Exact because
        # finished lanes freeze inside the segment body and admissions
        # only ever apply to the newest device state; the epoch counters
        # below stop a freshly admitted lane from being retired off a
        # snapshot that predates its first decoded segment.
        self._double_buffer = (
            os.environ.get("WHISPER_TPU_IFB_DOUBLE_BUFFER") == "1")
        self._seg_idx = 0                       # segments dispatched
        self._lane_epoch = [0] * num_lanes      # seg index vouching lane
        # built eagerly: a lazy hasattr-init under concurrent first
        # requests races N threads into N duplicate frontend traces
        from whisper_trtllm_tpu.audio.features import LogMelSpectrogram

        self._frontend = LogMelSpectrogram(cfg.num_mel_bins)

    # -- public ---------------------------------------------------------------
    def submit(self, mel: np.ndarray) -> int:
        """mel (3000, M) or (1, 3000, M) → request id."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        rid = self._next_id
        self._next_id += 1
        # [rid, mel, cross-KV-or-None]: the encode is pre-dispatched behind
        # a running segment (run()) so admission never waits for it
        self._queue.append([rid, mel, None])
        return rid

    def compute_mel(self, audio: np.ndarray) -> np.ndarray:
        """Raw 16 kHz audio (any length ≤ 30 s; padded/trimmed) → (1, T, M)
        mel via the on-device frontend. Thread-safe after construction
        (the frontend is built in __init__, jax dispatch is thread-safe) —
        the serving layer calls this OUTSIDE its scheduler lock."""
        from whisper_trtllm_tpu.audio.features import pad_or_trim

        return np.asarray(self._frontend.jit()(
            jnp.asarray(pad_or_trim(np.asarray(audio, np.float32))[None])))

    def submit_audio(self, audio: np.ndarray) -> int:
        """Raw audio → request id (frontend + submit)."""
        return self.submit(self.compute_mel(audio))

    def fetch(self, request_id: int) -> Optional[np.ndarray]:
        return self._results.pop(request_id, None)

    def _dispatch_segment(self):
        """Dispatch one jitted segment on the newest state; return a host-
        sync SNAPSHOT (copies of the 4 scheduler arrays + the segment
        index). Copies, because the state itself is donated into the NEXT
        dispatch; pre-armed with copy_to_host_async so the D2H round-trip
        rides behind the running segment (VERDICT r4 order 6)."""
        seg = (self._segment_short
               if (self._queue and self._segment_short is not None)
               else self._segment)
        self.state = seg(self.params, self.state)
        self._seg_idx += 1
        snap = tuple(jnp.copy(a) for a in
                     (self.state.finished, self.state.active,
                      self.state.tokens, self.state.pos)) + (self._seg_idx,)
        # pre-dispatch encodes for waiting requests (async): the ~10 ms
        # encoder + its dispatch latency ride behind the running segment
        # instead of serializing inside the retire/admit window
        self._pre_encode(self.num_lanes)
        for arr in snap[:4]:
            try:
                arr.copy_to_host_async()
            except Exception:  # noqa: BLE001 — optional fast path
                break
        return snap

    def run(self, max_segments: int = 10_000) -> None:
        """Process until the queue is empty and all lanes drain.

        Default: dispatch → sync → retire/admit per segment. With
        ``WHISPER_TPU_IFB_DOUBLE_BUFFER=1``: keep one segment in flight
        past the sync — segment N+1 is dispatched BEFORE N's outputs are
        consumed, so the host-side retire/admit overlaps device compute;
        admissions land one segment later (bounded by the adaptive short
        segment), token streams identical."""
        snap = None
        for _ in range(max_segments):
            if not self._double_buffer:
                self._retire_and_admit(snap)
                snap = None
                if not any(self._lane_req):
                    if not self._queue:
                        return
                    continue
                snap = self._dispatch_segment()
                continue
            busy = any(self._lane_req)
            if busy:
                new_snap = self._dispatch_segment()
            else:
                new_snap = None
            if snap is not None:
                self._retire_and_admit(snap)
            elif not busy:
                if not self._queue:
                    return
                self._retire_and_admit()
            snap = new_snap
        raise RuntimeError("run() exceeded max_segments")

    # -- internals ------------------------------------------------------------
    def _pre_encode(self, limit: int) -> None:
        """Dispatch (async) the encoder + cross-KV prep for up to ``limit``
        queued requests that don't have one yet."""
        for i, item in enumerate(self._queue):
            if i >= limit:
                break
            if item[2] is None:
                item[2] = self._encode(self.params, jnp.asarray(item[1]))

    def _retire_and_admit(self, snapshot=None) -> None:
        # one packed D2H sync window for the per-iteration host decision
        # (not one np.asarray per array): on transports with high fixed
        # round-trip latency (this environment's ~24 ms dev tunnel) the
        # per-iteration sync count — not bytes — sets the serving
        # scheduler's pace; measured as the ifb backend's load-test
        # pathology (docs/RUNTIME.md round-4 table). ``snapshot``
        # (finished, active, tokens, pos, seg_idx) is a pre-armed copy of
        # a dispatched segment's result; under double-buffering the device
        # is already running the NEXT segment while this host read lands.
        if snapshot is None:
            f_arr, a_arr = self.state.finished, self.state.active
            t_arr, p_arr = self.state.tokens, self.state.pos
            snap_seg = self._seg_idx
        else:
            f_arr, a_arr, t_arr, p_arr, snap_seg = snapshot
        finished, active = jax.device_get((f_arr, a_arr))
        retire = [lane for lane in range(self.num_lanes)
                  if active[lane] and finished[lane]
                  and self._lane_req[lane] is not None
                  # a snapshot can only vouch for lanes admitted before
                  # the segment it came from (double-buffer: a lane
                  # re-admitted behind the snapshot still shows its OLD
                  # request's frozen finished flag)
                  and self._lane_epoch[lane] <= snap_seg]
        if retire:
            tokens, pos = jax.device_get((t_arr, p_arr))
            keep = np.ones((self.num_lanes,), bool)
            for lane in retire:
                row = tokens[lane, : pos[lane] + 1]
                self._results[self._lane_req[lane]] = row
                self._lane_req[lane] = None
                keep[lane] = False
            # single batched deactivation instead of one .at[].set dispatch
            # per retired lane (applied to the NEWEST state — retired lanes
            # are frozen in any segment dispatched ahead, so this is exact)
            self.state = self.state._replace(
                active=self.state.active & jnp.asarray(keep)
            )
        for lane in range(self.num_lanes):
            if self._lane_req[lane] is None and self._queue:
                rid, mel, cross = self._queue.popleft()
                if cross is None:  # not pre-encoded (direct-drive callers)
                    cross = self._encode(self.params, jnp.asarray(mel))
                self.state = self._admit(
                    self.state, jnp.int32(lane),
                    tuple(c[:, 0] for c in cross),
                )
                self._lane_req[lane] = rid
                # first segment that can decode this request
                self._lane_epoch[lane] = self._seg_idx + 1
