"""HTTP serving daemon: POST a WAV, get tokens/text back.

The serving front end the reference leaves to GptSession embedders
(reference: cpp/tensorrt_llm/runtime/gptSession.cpp + batch_manager slot
protocol): requests land in the native C++ queue (cpp/slot_manager.cc),
a background scheduler thread drains them through the jitted pipeline in
fixed batch lanes, responses return per request.

Usage:
  python -m cli.serve --checkpoint engines/tiny.en [--port 8080]
      [--num-slots 8] [--hf-model openai/whisper-tiny.en]

  curl -s -X POST --data-binary @utt.wav localhost:8080/transcribe
  → {"request_id": N, "tokens": [...], "text": "..."}   (text with tokenizer)
  curl -s localhost:8080/healthz
"""

from __future__ import annotations

import argparse
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_handler(server_state):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                obj = {
                    "status": "ok",
                    "pending": int(server_state["server"].pending),
                }
                stats = getattr(server_state["server"], "stats", None)
                if callable(stats):  # sched backend: native queue counters
                    obj["scheduler"] = stats()
                self._reply(200, obj)
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/transcribe":
                self._reply(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            blob = self.rfile.read(length)
            try:
                from whisper_trtllm_tpu.native import load_wav_16k

                audio = load_wav_16k(blob)
            except Exception as e:
                self._reply(400, {"error": f"bad wav: {e}"})
                return
            srv = server_state["server"]
            rid = srv.submit(audio)
            # synchronous completion: poll the result map filled by the
            # scheduler thread
            import time as _time

            deadline = _time.monotonic() + 120
            tokens = None
            while _time.monotonic() < deadline:
                tokens = srv.fetch(rid)
                if tokens is not None:
                    break
                _time.sleep(0.02)
            if tokens is None:
                self._reply(504, {"error": "timeout"})
                return
            if isinstance(tokens, str):
                # ScheduledTranscriptionServer.EXPIRED — the request's
                # deadline elapsed before a batch launched
                self._reply(504, {"error": tokens, "request_id": int(rid)})
                return
            resp = {"request_id": int(rid), "tokens": [int(t) for t in tokens]}
            tok = server_state.get("tokenizer")
            if tok is not None:
                ids = [t for t in tokens[1:] if t not in server_state["specials"]]
                resp["text"] = tok.decode(ids, skip_special_tokens=True)
            self._reply(200, resp)

    return Handler


def scheduler_loop(server_state, stop: threading.Event):
    """Drain the request queue in fixed batch lanes; handlers poll fetch()."""
    srv = server_state["server"]
    while not stop.is_set():
        served = srv.step()
        stop.wait(0.002 if served else 0.02)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--num-slots", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--kv-cache-dtype", default="auto",
                    choices=["auto", "int8", "fp8"],
                    help="KV-cache storage precision. int8 (per-token "
                         "scales, T-minor cross layout) is the measured "
                         "serving sweet spot: transcript-exact on trained "
                         "weights and +60%% tiny.en throughput over bf16 KV "
                         "(docs/PERFORMANCE.md headline sweep)")
    ap.add_argument("--hf-model", default=None, help="tokenizer for text output")
    ap.add_argument("--backend", default="slots",
                    choices=["slots", "ifb", "sched"],
                    help="slots: utterance-level batch lanes; ifb: token-level "
                         "in-flight batching (continuous); sched: native "
                         "policy scheduler (priorities, deadlines, "
                         "tail-latency guard)")
    ap.add_argument("--max-wait-ms", type=int, default=20,
                    help="sched backend: launch a partial batch once the "
                         "oldest request has waited this long")
    ap.add_argument("--cache-dir", default=os.environ.get(
        "WHISPER_TPU_CACHE_DIR", "/tmp/wtpu_xla_cache"),
        help="persistent XLA compilation cache. Without it every daemon "
        "start pays the full remote compile INSIDE the serving path - "
        "measured as 37 s p95 and 504s on the first load-test batch "
        "(docs/RUNTIME.md). Empty string disables.")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the environment's "
                    "sitecustomize pins a TPU otherwise) - CI/smoke runs")
    args = ap.parse_args()

    if args.cpu:
        import jax

        try:  # must precede first backend use
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.runtime.server import TranscriptionServer
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(args.checkpoint)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           kv_cache_dtype=args.kv_cache_dtype)
    sess = WhisperSession(
        params, cfg,
        gen,
        RuntimeConfig(compute_dtype=args.dtype,
                      persistent_cache_dir=args.cache_dir or None),
    )
    if args.backend == "ifb":
        from whisper_trtllm_tpu.runtime.server import IfbTranscriptionServer

        server = IfbTranscriptionServer(
            params, cfg,
            gen,
            num_slots=args.num_slots,
        )
    elif args.backend == "sched":
        from whisper_trtllm_tpu.runtime.server import (
            ScheduledTranscriptionServer)

        server = ScheduledTranscriptionServer(
            sess,
            allowed_batch_sizes=sorted({1, 2, 4, args.num_slots}),
            max_wait_ms=args.max_wait_ms)
    else:
        server = TranscriptionServer(sess, num_slots=args.num_slots)
    state = {"server": server, "specials": {
        cfg.eos_token_id, cfg.pad_token_id, cfg.decoder_start_token_id,
        *[t for _, t in cfg.forced_decoder_ids],
    }}
    if args.hf_model:
        try:
            from transformers import WhisperTokenizerFast

            state["tokenizer"] = WhisperTokenizerFast.from_pretrained(args.hf_model)
        except Exception:
            pass

    stop = threading.Event()
    t = threading.Thread(target=scheduler_loop, args=(state, stop), daemon=True)
    t.start()

    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), build_handler(state))
    print(f"serving on :{args.port} (slots={args.num_slots})")
    try:
        httpd.serve_forever()
    finally:
        stop.set()


if __name__ == "__main__":
    main()
