"""Tiny.en headline batch sweep: is BATCH=16 actually the saturation point?

bench.py's BATCH=16 was chosen from a b8-vs-b16 measurement (round 1);
medium later measured saturation at b16, but tiny has ~7x less weight
traffic per token, so its decode loop is far more overhead-dominated and
may keep scaling past 16. This sweeps b16/b32/b64 (+ int8-KV at the best
batch) with exactly bench.py's protocol — pre-staged audio, jitted
frontend+pipeline, one warm pass, 3 timed passes, median + spread,
hard D2H sync — and prints one JSON line per config.

  python scripts/tiny_batch_sweep.py [--batches 16,32,64] [--kv]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

AUDIO_SECONDS_PER_UTT = 30.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--kv", action="store_true",
                    help="also measure int8-KV at each batch")
    ap.add_argument("--kv-dtypes", default=None,
                    help="explicit comma list of KV dtypes to measure "
                         "(auto/int8/fp8), overriding --kv")
    ap.add_argument("--utts", type=int, default=96,
                    help="~total utterances per config (rounded to batches)")
    ap.add_argument("--gen-tokens", type=int, default=48)
    args = ap.parse_args()
    gen_tokens = args.gen_tokens

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from whisper_trtllm_tpu.audio.features import LogMelSpectrogram, N_SAMPLES
    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens

    cfg = WhisperConfig.tiny_en()
    cfg = dataclasses.replace(cfg, eos_token_id=-1)     # no early exit
    params16 = jax.device_put(
        cast_params(init_params(cfg, seed=0), jnp.bfloat16))
    frontend = LogMelSpectrogram(cfg.num_mel_bins)
    rng = np.random.default_rng(0)

    def measure(batch, kv_cache_dtype):
        gen = GenerationConfig(max_new_tokens=gen_tokens,
                               kv_cache_dtype=kv_cache_dtype)
        pipeline = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))
        n_batches = max(2, args.utts // batch)
        audio = [
            jax.device_put(
                rng.standard_normal((batch, N_SAMPLES)).astype(np.float32)
                * 0.1)
            for _ in range(n_batches)
        ]

        def run_pass():
            t0 = time.perf_counter()
            last = None
            for a in audio:
                mel = frontend.jit()(a).astype(jnp.bfloat16)
                last, _ = pipeline(params16, mel)
            np.asarray(last[0, -1])                     # hard D2H sync
            return time.perf_counter() - t0

        tc0 = time.perf_counter()
        run_pass()                                      # warmup/compile
        compile_s = time.perf_counter() - tc0
        total_audio = batch * n_batches * AUDIO_SECONDS_PER_UTT
        rates = sorted(total_audio / run_pass() for _ in range(3))
        print(json.dumps({
            "batch": batch, "kv": kv_cache_dtype,
            "audio_s_per_s": round(rates[1], 1),
            "spread": [round(rates[0], 1), round(rates[2], 1)],
            "utts": batch * n_batches,
            "warm_pass_s": round(compile_s, 1),
        }), flush=True)
        return rates[1]

    if args.kv_dtypes:
        dtypes = args.kv_dtypes.split(",")
    else:
        dtypes = ["auto", "int8"] if args.kv else ["auto"]
    for b in [int(x) for x in args.batches.split(",")]:
        for dt in dtypes:
            measure(b, dt)


if __name__ == "__main__":
    main()
