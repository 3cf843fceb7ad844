"""HTTP serving daemon tests: WAV in, tokens out, through the real native
queue + scheduler thread (model replaced by a deterministic fake)."""

import http.client
import io
import json
import struct
import threading
import time

import numpy as np
import pytest

native = pytest.importorskip("whisper_trtllm_tpu.native")
if not native.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)

from http.server import ThreadingHTTPServer

from cli.serve import build_handler, scheduler_loop
from whisper_trtllm_tpu.runtime.server import TranscriptionServer


def _wav(samples: np.ndarray, rate=16000) -> bytes:
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


class FakeSession:
    """Deterministic stand-in: token = round(1000 * mean|audio|)."""

    def transcribe(self, audio):
        b = len(audio)
        tok = np.asarray(
            [[1, int(round(float(np.abs(a).mean()) * 1000)) + 10, 2]
             for a in audio], np.int32)
        return tok, np.full((b,), 3, np.int32)


@pytest.fixture(scope="module")
def server():
    srv = TranscriptionServer(FakeSession(), num_slots=2, max_samples=16000)
    state = {"server": srv, "specials": {1, 2}}
    stop = threading.Event()
    t = threading.Thread(target=scheduler_loop, args=(state, stop), daemon=True)
    t.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_handler(state))
    ht = threading.Thread(target=httpd.serve_forever, daemon=True)
    ht.start()
    yield httpd.server_address[1]
    stop.set()
    httpd.shutdown()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=10)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())["status"] == "ok"


def test_transcribe_roundtrip(server, rng):
    audio = np.full(8000, 0.25, np.float32)
    status, obj = _post(server, "/transcribe", _wav(audio))
    assert status == 200
    # mean|audio| over the 16000-sample padded slot = 0.125 → token 135
    assert obj["tokens"][1] == 135


def test_transcribe_bad_wav(server):
    status, obj = _post(server, "/transcribe", b"garbage bytes")
    assert status == 400 and "bad wav" in obj["error"]


def test_concurrent_requests(server):
    results = {}

    def worker(i):
        level = 0.1 * (i + 1)
        audio = np.full(16000, level, np.float32)
        status, obj = _post(server, "/transcribe", _wav(audio))
        results[i] = (status, obj["tokens"][1])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i, (status, tok) in results.items():
        assert status == 200
        expect = int(round(min(0.1 * (i + 1), 1.0) * 32767 / 32768 * 1000)) + 10
        assert abs(tok - expect) <= 1


def test_scheduled_server_roundtrip():
    """sched backend: priority-ordered launch, deadline expiry, padded
    batches, stats counters (model replaced by the deterministic fake)."""
    from whisper_trtllm_tpu.runtime.server import ScheduledTranscriptionServer

    rng = np.random.default_rng(0)
    n_samples = 16000
    srv = ScheduledTranscriptionServer(
        FakeSession(), allowed_batch_sizes=(1, 2), max_wait_ms=10,
        max_samples=n_samples)

    a = rng.standard_normal(n_samples).astype(np.float32) * 0.1
    r1 = srv.submit(a)
    r2 = srv.submit(a, priority=5)
    assert srv.step() == 2                     # full batch launches at once
    t1, t2 = srv.fetch(r1), srv.fetch(r2)
    assert t1 is not None and t2 is not None
    np.testing.assert_array_equal(t1, t2)      # identical audio -> tokens

    # deadline expiry
    r3 = srv.submit(a, timeout_ms=1)
    time.sleep(0.01)
    srv.step()
    # either expired before launch, or raced the poll; both are terminal
    out = srv.fetch(r3)
    assert out is srv.EXPIRED or out is not None

    # partial batch waits for the guard then pads to an allowed size
    r4 = srv.submit(a)
    assert srv.step() in (0, 1)
    time.sleep(0.02)
    srv.run_until_drained()
    assert srv.fetch(r4) is not None
    st = srv.stats()
    assert st["submitted"] == 4 and st["launched_requests"] >= 3


def test_scheduled_server_threaded():
    """Concurrent submitters against one scheduler thread: every request
    reaches a terminal state (the native mutex + bounded stats path)."""
    import threading
    import time

    from whisper_trtllm_tpu.runtime.server import ScheduledTranscriptionServer

    srv = ScheduledTranscriptionServer(
        FakeSession(), allowed_batch_sizes=(1, 2, 4), max_wait_ms=5,
        max_samples=4000)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            srv.step()
            time.sleep(0.001)

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    rng = np.random.default_rng(0)
    ids = []

    def submitter(seed):
        r = np.random.default_rng(seed)
        for _ in range(10):
            a = r.standard_normal(4000).astype(np.float32) * 0.1
            ids.append(srv.submit(a, priority=int(r.integers(0, 3))))

    subs = [threading.Thread(target=submitter, args=(i,)) for i in range(4)]
    for s in subs:
        s.start()
    for s in subs:
        s.join()

    deadline = time.monotonic() + 20
    done = {}
    while len(done) < len(ids) and time.monotonic() < deadline:
        for rid in ids:
            if rid not in done:
                out = srv.fetch(rid)
                if out is not None:
                    done[rid] = out
        time.sleep(0.005)
    stop.set()
    assert len(done) == 40, f"only {len(done)}/40 terminal"
    st = srv.stats()
    assert st["submitted"] == 40 and st["launched_requests"] == 40
