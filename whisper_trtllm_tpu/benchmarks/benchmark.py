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
    from whisper_trtllm_tpu.benchmarks.mem_monitor import MemoryMonitor

    mon = MemoryMonitor().start()
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sess.transcribe_features(mel)
        lats.append(time.perf_counter() - t0)
    peak_gib = mon.stop()
    lats = np.asarray(lats)
    batch_s = float(np.median(lats))
    return {
        "peak_mem_gib": peak_gib,
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


def bench_zoo(name: str, batch: int, in_len: int, out_len: int, dtype: str,
              iters: int, quant: str | None = None) -> dict:
    """Benchmark a named zoo config (the reference's gpt_benchmark /
    bert_benchmark, reference: benchmarks/{gpt,bert}_benchmark.py +
    allowed_configs.py): causal families run the cached generation loop and
    report tokens/s; BERT runs the encoder and reports sequences/s. Same
    latency percentiles as the reference (benchmarks/README.md:31-35)."""
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.benchmarks.allowed_configs import (
        ALLOWED_CONFIGS, build_model)

    entry = ALLOWED_CONFIGS[name]
    fam, cfg, init_params, generate, forward = build_model(name)
    batch = min(batch, entry.max_batch_size)
    in_len = min(in_len, entry.max_input_len)
    out_len = min(out_len, entry.max_output_len) if entry.max_output_len else 0

    params = init_params(cfg, seed=0)
    if quant == "int8":
        from whisper_trtllm_tpu.quantization.quantize import weight_only_quantize

        params = weight_only_quantize(params)
    elif quant == "sq":
        # SmoothQuant int8 act+weight — the reference benchmark's
        # *_sq configs (reference: benchmarks/allowed_configs.py SmoothQuant
        # forks of gpt configs); calibration on a synthetic batch here since
        # benchmark weights are random anyway
        if fam != "gpt":
            raise SystemExit("--quant sq supports the gpt family")
        from whisper_trtllm_tpu.quantization.smooth import (
            gpt_act_stats, smooth_quantize_gpt)

        cal = jnp.asarray(np.random.default_rng(1).integers(
            3, cfg.vocab_size, (2, min(64, in_len or 64))).astype(np.int32))
        params = smooth_quantize_gpt(params, gpt_act_stats(params, cfg, cal))
    if dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.asarray(x).dtype == jnp.float32 else x, params)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(3, cfg.vocab_size, (batch, in_len)).astype(np.int32))

    if fam == "bert":
        fn = jax.jit(lambda p, t: forward(p, cfg, t))
        run = lambda: jax.tree_util.tree_leaves(fn(params, tokens))[0]
        work_tokens = batch * in_len
    else:
        # disable EOS early-exit for stable measurement (random weights)
        cfg = dataclasses.replace(cfg, eos_token_id=-1)
        run = lambda: generate(params, cfg, tokens, max_new_tokens=out_len)
        work_tokens = batch * out_len

    np.asarray(run()).reshape(-1)[:1]  # compile + hard D2H sync
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out).reshape(-1)[:1]  # D2H completion barrier
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats)
    med = float(np.median(lats))
    row = {
        "model": name,
        "family": fam,
        "batch": batch,
        "input_len": in_len,
        "output_len": out_len,
        "dtype": dtype,
        "quant": quant,
        "latency_ms_p50": round(float(np.percentile(lats, 50)) * 1e3, 2),
        "latency_ms_p95": round(float(np.percentile(lats, 95)) * 1e3, 2),
        "latency_ms_p99": round(float(np.percentile(lats, 99)) * 1e3, 2),
        "tokens_per_s" if fam != "bert" else "tokens_encoded_per_s":
            round(work_tokens / med, 1),
        "backend": str(jax.default_backend()),
    }
    if fam == "bert":
        row["sequences_per_s"] = round(batch / med, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", nargs="+", default=["tiny.en"],
                    help="whisper presets, or zoo names from "
                         "allowed_configs.py (gpt_350m, llama_7b, bert_base, "
                         "...)")
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--dtype", nargs="+", default=["float32"])
    ap.add_argument("--gen-tokens", type=int, default=48)
    ap.add_argument("--in-len", type=int, default=32,
                    help="prompt length for zoo causal models / BERT seq len")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--quant", choices=["int8", "sq"], default=None,
                    help="weight-only int8 for zoo models")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    import jax

    try:  # cold compiles ride a slow remote tunnel here; persist them
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from whisper_trtllm_tpu.benchmarks.allowed_configs import ALLOWED_CONFIGS

    for model in args.model:
        for dtype in args.dtype:
            for batch in args.batch:
                if model in ALLOWED_CONFIGS:
                    row = bench_zoo(
                        model, batch, args.in_len, args.gen_tokens, dtype,
                        args.iters, args.quant,
                    )
                else:
                    row = bench_config(
                        model, batch, dtype, args.gen_tokens, args.iters,
                        args.checkpoint, args.num_beams,
                    )
                print(json.dumps(row))


if __name__ == "__main__":
    main()
