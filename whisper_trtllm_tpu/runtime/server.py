"""Serving loop: native request queue/slots + batched device execution.

Analog of the reference's serving substrate (reference:
cpp/tensorrt_llm/runtime/gptSession.cpp:700 generation loop +
cpp/tensorrt_llm/batch_manager/ slot protocol): clients submit raw audio,
the C++ SlotManager packs waiting requests into fixed batch lanes, one jitted
pipeline invocation serves the whole batch, results are fetched by request
id. The compiled executable sees one static (num_slots, ...) shape.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from whisper_trtllm_tpu.runtime.session import WhisperSession


class TranscriptionServer:
    def __init__(self, session: WhisperSession, num_slots: int = 8,
                 max_samples: int = 480000):
        from whisper_trtllm_tpu.native import NativeSlotManager

        self.session = session
        self.slots = NativeSlotManager(num_slots, max_samples)

    def submit(self, audio: np.ndarray) -> int:
        """Enqueue one utterance (float32 16 kHz); returns request id."""
        return self.slots.submit(audio)

    def step(self) -> int:
        """One scheduling round: fill slots, run the batch, complete slots.
        Returns the number of requests served."""
        ids, audio, active = self.slots.schedule()
        if active == 0:
            return 0
        tokens, lengths = self.session.transcribe(audio)
        for s in range(self.slots.num_slots):
            if ids[s] >= 0:
                self.slots.complete(s, tokens[s, : lengths[s]])
        return active

    def fetch(self, request_id: int) -> Optional[np.ndarray]:
        return self.slots.fetch(request_id)

    def run_until_drained(self, max_rounds: int = 1000) -> None:
        for _ in range(max_rounds):
            if self.step() == 0 and self.slots.pending == 0:
                return

    @property
    def pending(self) -> int:
        return int(self.slots.pending)


class IfbTranscriptionServer:
    """Serving loop over the token-level InflightBatcher: a finished lane is
    refilled mid-decode without waiting for its batch neighbors (true
    continuous batching — the reference's in-flight batching protocol,
    reference: docs/in_flight_batching.md:16-50). Same submit/step/fetch
    surface as TranscriptionServer, so cli/serve.py can swap backends."""

    def __init__(self, params, cfg, generation=None, num_slots: int = 8,
                 segment_steps: int = 16):
        import threading

        from whisper_trtllm_tpu.runtime.ifb import InflightBatcher

        self.batcher = InflightBatcher(
            params, cfg, generation, num_lanes=num_slots,
            segment_steps=segment_steps,
        )
        # the batcher's host state is not thread-safe; serialize the
        # scheduler thread against handler submits/fetches
        self._lock = threading.Lock()

    def submit(self, audio: np.ndarray) -> int:
        with self._lock:
            return self.batcher.submit_audio(np.asarray(audio, np.float32))

    def step(self) -> int:
        with self._lock:
            self.batcher._retire_and_admit()
            active = sum(1 for r in self.batcher._lane_req if r is not None)
            if active:
                self.batcher.state = self.batcher._segment(
                    self.batcher.params, self.batcher.state
                )
            return active

    def fetch(self, request_id: int):
        with self._lock:
            return self.batcher.fetch(request_id)

    @property
    def pending(self) -> int:
        return len(self.batcher._queue)
