"""Benchmark CLI: latency/throughput grids over models, batch sizes, dtypes.

Analog of the reference's benchmark suite (reference:
benchmarks/benchmark.py + allowed_configs.py + base_benchmark.py:18-54,
reporting protocol benchmarks/README.md:22-51): same tokens/sec +
p50/p95/p99 latency lines, plus audio-seconds/s (the Whisper north-star
metric, BASELINE.md).

Usage:
  python -m whisper_trtllm_tpu.benchmarks.benchmark \
      --model tiny.en base.en --batch 1 8 --dtype float32 bfloat16 \
      [--gen-tokens 48] [--iters 10] [--checkpoint DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def bench_config(model: str, batch: int, dtype: str, gen_tokens: int,
                 iters: int, checkpoint: str | None = None,
                 num_beams: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession

    if checkpoint:
        from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

        params, cfg = load_checkpoint(checkpoint)
    else:
        cfg = WhisperConfig.preset(model)
        params = init_params(cfg, seed=0)
    # fixed decode length for stable measurement (no EOS early exit)
    cfg = dataclasses.replace(cfg, eos_token_id=-1)

    sess = WhisperSession(
        params, cfg,
        GenerationConfig(max_new_tokens=gen_tokens, num_beams=num_beams),
        RuntimeConfig(compute_dtype=dtype),
    )
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    sess.transcribe_features(mel)  # compile
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sess.transcribe_features(mel)
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats)
    batch_s = float(np.median(lats))
    return {
        "model": model,
        "batch": batch,
        "dtype": dtype,
        "num_beams": num_beams,
        "gen_tokens": gen_tokens,
        "latency_ms_p50": round(float(np.percentile(lats, 50)) * 1e3, 2),
        "latency_ms_p95": round(float(np.percentile(lats, 95)) * 1e3, 2),
        "latency_ms_p99": round(float(np.percentile(lats, 99)) * 1e3, 2),
        "tokens_per_s": round(batch * gen_tokens / batch_s, 1),
        "audio_s_per_s": round(batch * 30.0 / batch_s, 1),
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", nargs="+", default=["tiny.en"])
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--dtype", nargs="+", default=["float32"])
    ap.add_argument("--gen-tokens", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    for model in args.model:
        for dtype in args.dtype:
            for batch in args.batch:
                row = bench_config(
                    model, batch, dtype, args.gen_tokens, args.iters,
                    args.checkpoint, args.num_beams,
                )
                print(json.dumps(row))


if __name__ == "__main__":
    main()
