"""Serving-daemon load characterization (VERDICT r2 order 10).

Starts cli/serve.py as a subprocess (any backend), drives N concurrent
closed-loop clients POSTing WAV files, and reports per-request latency
percentiles, end-to-end throughput, and (sched backend) the native
scheduler's queue stats. The reference's in-flight-batching purpose doc
promises exactly this behavior under concurrent load (reference:
docs/in_flight_batching.md:16-50) but ships no load harness.

  python scripts/serve_loadtest.py --checkpoint ckpt --wav-dir wavs \
      [--backend slots|ifb|sched] [--clients 16] [--requests 64]
      [--port 18080] [--max-new-tokens 32]

Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import pathlib
import subprocess
import sys
import threading
import time

import numpy as np


def wait_healthy(port: int, deadline_s: float) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        try:
            c = http.client.HTTPConnection("localhost", port, timeout=2)
            c.request("GET", "/healthz")
            if c.getresponse().status == 200:
                return
        except OSError:
            pass
        time.sleep(1.0)
    raise RuntimeError(f"daemon not healthy after {deadline_s}s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--backend", default="slots",
                    choices=["slots", "ifb", "sched"])
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--port", type=int, default=18080)
    ap.add_argument("--num-slots", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--startup-timeout", type=float, default=1200.0,
                    help="cold compiles ride the remote tunnel")
    ap.add_argument("--cpu", action="store_true",
                    help="run the daemon on the CPU backend (smoke tests)")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--kv-cache-dtype", default=None,
                    choices=[None, "auto", "int8", "fp8"],
                    help="KV storage precision passed through to the daemon")
    args = ap.parse_args(argv)

    wavs = sorted(pathlib.Path(args.wav_dir).glob("*.wav"))
    if not wavs:
        raise FileNotFoundError(f"no wavs under {args.wav_dir}")
    blobs = [w.read_bytes() for w in wavs]

    cmd = [sys.executable, "-m", "cli.serve",
           "--checkpoint", args.checkpoint, "--port", str(args.port),
           "--num-slots", str(args.num_slots), "--backend", args.backend,
           "--max-new-tokens", str(args.max_new_tokens)]
    if args.cpu:
        cmd.append("--cpu")
    if args.dtype:
        cmd += ["--dtype", args.dtype]
    if args.kv_cache_dtype:
        cmd += ["--kv-cache-dtype", args.kv_cache_dtype]
    proc = subprocess.Popen(
        cmd,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        wait_healthy(args.port, args.startup_timeout)

        # warmup: one request end-to-end compiles the batch=slots graph
        c = http.client.HTTPConnection("localhost", args.port, timeout=1200)
        c.request("POST", "/transcribe", body=blobs[0])
        assert c.getresponse().status in (200, 504)

        lats: list = []
        errors: list = []
        lock = threading.Lock()
        counter = {"next": 0}

        def client():
            conn = http.client.HTTPConnection("localhost", args.port,
                                              timeout=600)
            while True:
                with lock:
                    i = counter["next"]
                    if i >= args.requests:
                        return
                    counter["next"] = i + 1
                t0 = time.perf_counter()
                try:
                    conn.request("POST", "/transcribe",
                                 body=blobs[i % len(blobs)])
                    r = conn.getresponse()
                    r.read()
                    dt = time.perf_counter() - t0
                    with lock:
                        if r.status == 200:
                            lats.append(dt)
                        else:
                            errors.append(r.status)
                except OSError as e:
                    conn = http.client.HTTPConnection(
                        "localhost", args.port, timeout=600)
                    with lock:
                        errors.append(repr(e))

        t_start = time.perf_counter()
        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start

        report = {
            "backend": args.backend,
            "clients": args.clients,
            "requests_ok": len(lats),
            "errors": errors[:5],
            "wall_s": round(wall, 2),
            "throughput_req_s": round(len(lats) / wall, 2),
            "audio_s_per_s": round(len(lats) * 30.0 / wall, 1),
            "latency_ms": {
                "p50": round(float(np.percentile(lats, 50)) * 1e3, 1),
                "p95": round(float(np.percentile(lats, 95)) * 1e3, 1),
                "p99": round(float(np.percentile(lats, 99)) * 1e3, 1),
                "max": round(float(np.max(lats)) * 1e3, 1),
            } if lats else None,
            "num_slots": args.num_slots,
            "max_new_tokens": args.max_new_tokens,
        }
        # scheduler stats ride the healthz endpoint if the backend exposes
        # them (sched backend: queue depth, launches, expirations)
        try:
            c = http.client.HTTPConnection("localhost", args.port, timeout=10)
            c.request("GET", "/healthz")
            report["healthz"] = json.loads(c.getresponse().read())
        except OSError:
            pass
        print(json.dumps(report))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
