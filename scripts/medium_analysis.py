"""medium.en decode performance closure (VERDICT r1 item 6).

Phase-level timing at medium dims (int8 weights + int8 KV, bf16 compute,
batch 16) with the scalar-slice D2H sync protocol, an analytic roofline
statement at medium dims, and the levers the tiny analysis applied
(vocab-table quantization, fused QKV) re-measured at medium where the
verdict may differ.

  python scripts/medium_analysis.py [--batch 16] [--gen 48] [--variant all]

Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_variant(name, cfg, gen_tokens, batch, *, weight_int8=True,
                kv_dtype="int8", quantize_vocab=False, fuse_qkv=False,
                cross_layout="auto", weight_int4=False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.benchmarks import roofline
    from whisper_trtllm_tpu.config import GenerationConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    # same load-time transform order as WhisperSession._prepare_params:
    # fusion -> weight quant -> vocab quant -> cast
    params = init_params(cfg, seed=0)
    if fuse_qkv:
        from whisper_trtllm_tpu.models.whisper.model import fuse_qkv_params
        params = fuse_qkv_params(params)
    if weight_int4:
        from whisper_trtllm_tpu.quantization.quantize import (
            weight_only_quantize_int4,
        )
        params = weight_only_quantize_int4(params)
    elif weight_int8:
        from whisper_trtllm_tpu.quantization.quantize import (
            weight_only_quantize,
        )
        params = weight_only_quantize(params)
    if quantize_vocab:
        from whisper_trtllm_tpu.quantization import quantize_vocab_embedding
        params = quantize_vocab_embedding(params)
    params = jax.device_put(cast_params(params, jnp.bfloat16))

    gen = GenerationConfig(max_new_tokens=gen_tokens,
                           kv_cache_dtype=kv_dtype if kv_dtype else "auto",
                           cross_kv_layout=cross_layout)
    rng = np.random.default_rng(0)
    mel = jax.device_put(jnp.asarray(rng.standard_normal(
        (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)) * 0.5,
        jnp.bfloat16))

    enc_fn = jax.jit(lambda p, m: wmodel.encode(p, cfg, m))
    kv_fn = jax.jit(lambda p, e: wmodel.compute_cross_kv(p, cfg, e))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def timeit(fn, *args, iters=4):
        fn(*args)                       # compile + warm
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    enc_s = timeit(enc_fn, params, mel)
    enc = enc_fn(params, mel)
    kv_s = timeit(kv_fn, params, enc)

    def full(p, m):
        e = wmodel.encode(p, cfg, m)
        return greedy_decode(p, cfg, e, gen)

    pipe = jax.jit(full)
    pipe_s = timeit(lambda p, m: pipe(p, m)[0], params, mel)
    decode_s = pipe_s - enc_s

    wb = 0.5 if weight_int4 else (1.0 if weight_int8 else 2.0)
    kvb = 1.0 if kv_dtype in ("int8", "fp8") else 2.0
    vb = 1.0 if quantize_vocab else 2.0
    bytes_step = roofline.decode_bytes_per_step(
        cfg, batch, gen_tokens // 2, weight_bytes=wb, kv_bytes=kvb,
        vocab_bytes=vb)
    _, hbm = roofline.chip_peaks(jax.devices()[0].device_kind)
    floor_s = gen_tokens * bytes_step / (hbm * 1e9) if hbm else None
    audio = batch * 30.0
    return {
        "variant": name, "batch": batch, "gen": gen_tokens,
        "enc_ms": round(enc_s * 1e3, 2),
        "cross_kv_ms": round(kv_s * 1e3, 2),
        "pipeline_ms": round(pipe_s * 1e3, 2),
        "decode_ms": round(decode_s * 1e3, 2),
        "us_per_step": round(decode_s / gen_tokens * 1e6, 1),
        "decode_hbm_floor_ms": round(floor_s * 1e3, 2) if floor_s else None,
        "roofline_frac": (round(floor_s / decode_s, 3)
                          if floor_s and decode_s > 0 else None),
        "audio_s_per_s": round(audio / pipe_s, 1),
        "bytes_per_step_mb": round(bytes_step / 1e6, 1),
    }


def main():
    import dataclasses

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium.en")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gen", type=int, default=48)
    ap.add_argument("--variant", default="all",
                    choices=["all", "base", "int8kv_bhtd", "bhdt_float",
                             "fp8kv", "qvocab", "fuseqkv",
                             "bf16", "bf16_int8kv", "bf16_fp8kv",
                             "bf16_int8kv_qvocab", "qvocab_fuseqkv",
                             "int4w", "int4w_qvocab"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import WhisperConfig

    cfg = dataclasses.replace(WhisperConfig.preset(args.preset),
                              eos_token_id=-1)

    variants = {
        "base": dict(),
        "int8kv_bhtd": dict(cross_layout="bhtd"),   # pre-r3 layout ablation
        "bhdt_float": dict(weight_int8=False, kv_dtype=None,
                           cross_layout="bhdt"),    # T-minor on bf16 caches
        "fp8kv": dict(kv_dtype="fp8"),
        "qvocab": dict(quantize_vocab=True),
        "fuseqkv": dict(fuse_qkv=True),
        "qvocab_fuseqkv": dict(quantize_vocab=True, fuse_qkv=True),
        "bf16": dict(weight_int8=False, kv_dtype=None),
        "bf16_int8kv": dict(weight_int8=False),
        "bf16_fp8kv": dict(weight_int8=False, kv_dtype="fp8"),
        "bf16_int8kv_qvocab": dict(weight_int8=False, quantize_vocab=True),
        # round-4 weight-traffic lever (VERDICT r3 order 6): post-T-minor
        # the decode residue is per-step weight reads (~25-30% of step
        # bytes at int8) — int4 halves them
        "int4w": dict(weight_int4=True),
        "int4w_qvocab": dict(weight_int4=True, quantize_vocab=True),
    }
    names = list(variants) if args.variant == "all" else [args.variant]
    for name in names:
        out = run_variant(name, cfg, args.gen, args.batch, **variants[name])
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
