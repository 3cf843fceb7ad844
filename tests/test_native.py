"""Native library (cpp/libwtpu.so) + serving loop tests."""

import io
import struct

import numpy as np
import pytest

native = pytest.importorskip("whisper_trtllm_tpu.native")

if not native.native_available():
    pytest.skip("native library unavailable (no cmake/ninja?)",
                allow_module_level=True)


def _make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    buf.write(b"RIFF")
    buf.write(struct.pack("<I", 36 + len(pcm)))
    buf.write(b"WAVEfmt ")
    buf.write(struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16))
    buf.write(b"data")
    buf.write(struct.pack("<I", len(pcm)))
    buf.write(pcm)
    return buf.getvalue()


def test_wav_roundtrip(rng):
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wav = _make_wav(audio)
    decoded = native.load_wav_16k(wav)
    assert decoded.shape == (16000,)
    np.testing.assert_allclose(decoded, audio, atol=1e-3)


def test_wav_resampled(rng):
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    wav = _make_wav(audio, rate=8000)
    decoded = native.load_wav_16k(wav)
    assert decoded.shape == (16000,)


def test_wav_malformed():
    with pytest.raises(ValueError):
        native.load_wav_16k(b"not a wav file at all........")


def test_slot_manager_flow(rng):
    sm = native.NativeSlotManager(num_slots=2, max_samples=64)
    r1 = sm.submit(np.ones(10, np.float32))
    r2 = sm.submit(np.ones(20, np.float32) * 2)
    r3 = sm.submit(np.ones(30, np.float32) * 3)
    ids, audio, active = sm.schedule()
    assert active == 2 and list(ids) == [r1, r2]
    assert audio.shape == (2, 64)
    assert audio[0, :10].sum() == 10 and audio[0, 10:].sum() == 0

    sm.complete(0, np.asarray([5, 6, 7], np.int32))
    assert sm.fetch(r1).tolist() == [5, 6, 7]
    assert sm.fetch(r2) is None

    ids, audio, active = sm.schedule()   # r3 takes the freed slot
    assert active == 2 and ids[0] == r3


def test_transcription_server(rng):
    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.runtime.server import TranscriptionServer

    cfg = WhisperConfig.testing()
    n_samples = 2 * cfg.max_source_positions * 160  # frames × hop
    sess = WhisperSession(init_params(cfg, seed=0), cfg,
                          GenerationConfig(max_new_tokens=6))
    # tiny config: frontend shape won't match encoder; serve features directly
    # via a session shim
    class _FeatureSession:
        cfg = sess.cfg

        def transcribe(self, audio):
            mel = rng.standard_normal(
                (len(audio), 2 * cfg.max_source_positions, cfg.num_mel_bins)
            ).astype(np.float32)
            return sess.transcribe_features(mel)

    srv = TranscriptionServer(_FeatureSession(), num_slots=2,
                              max_samples=n_samples)
    reqs = [srv.submit(np.zeros(n_samples, np.float32)) for _ in range(5)]
    srv.run_until_drained()
    for r in reqs:
        tokens = srv.fetch(r)
        assert tokens is not None and tokens[0] == cfg.decoder_start_token_id


def test_native_batch_scheduler():
    """C++ BatchScheduler through ctypes: allowed-size launch, priority
    ordering, tail-latency launch, deadline expiry, stats."""
    import time

    from whisper_trtllm_tpu.native.lib import (
        NativeBatchScheduler,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable")

    sched = NativeBatchScheduler([2, 4], max_wait_ms=30)
    batch, expired = sched.poll()
    assert len(batch) == 0

    for i in (1, 2, 3, 4):
        sched.submit(i)
    batch, _ = sched.poll()
    assert list(batch) == [1, 2, 3, 4]

    # priority jumps the FIFO
    sched.submit(10); sched.submit(11, priority=9)
    sched.submit(12); sched.submit(13)
    batch, _ = sched.poll()
    assert list(batch)[0] == 11

    # partial batch launches only after the tail guard
    sched.submit(20); sched.submit(21); sched.submit(22)
    batch, _ = sched.poll()
    assert len(batch) == 0
    time.sleep(0.05)
    batch, _ = sched.poll()
    assert len(batch) == 2 and sched.pending == 1

    # deadline expiry surfaces in poll + stats; the same poll also launches
    # 22 (its wait already exceeds the tail guard)
    sched.submit(30, timeout_ms=1)
    time.sleep(0.01)
    batch, expired = sched.poll()
    assert 30 in list(expired)
    assert list(batch) == [22]
    assert len(sched.flush()) == 0
    st = sched.stats()
    assert st["submitted"] == 12 and st["expired"] == 1
    assert st["launched_requests"] == 11
    assert st["queue_delay_p95_us"] >= st["queue_delay_p50_us"] >= 0
