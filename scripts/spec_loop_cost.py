"""Per-round cost of the speculative loop, isolated from acceptance.

With independently-random target/draft weights greedy acceptance is ~0, so
every speculation round emits exactly one token (the target's bonus) and
ms/utt divided by rounds measures the per-round loop cost — the quantity
the round-4 trained-weight spec_bench could not separate from acceptance.
Used to quantify the encoder-fusion fix (runtime/speculative.py: both
encoders moved inside the jitted loop, one device dispatch per utterance
instead of eager per-op encoder dispatches + the loop call).

  python scripts/spec_loop_cost.py [--gammas 2,4,6] [--utts 8]

Prints one JSON line per gamma plus a greedy baseline line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gammas", default="2,4,6")
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=96)
    ap.add_argument("--preset", default="tiny.en",
                    help="TARGET preset (draft stays the 2L/d192 micro): "
                    "per-round loop cost vs per-step greedy cost at any "
                    "target size, acceptance-independent (random weights "
                    "accept ~0 -> 1 token/round)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from whisper_trtllm_tpu.audio.features import LogMelSpectrogram, N_SAMPLES
    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.runtime.speculative import (
        speculative_transcribe_tokens,
    )

    import dataclasses

    t_cfg = WhisperConfig.preset(args.preset)
    # the round-4 "micro" draft shape: 2 layers / d192 (spec_bench draft);
    # token config follows the target so both propose in one space
    d_cfg = dataclasses.replace(
        t_cfg, d_model=192, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=3, decoder_attention_heads=3,
        encoder_ffn_dim=768, decoder_ffn_dim=768)
    t_params = jax.device_put(
        cast_params(init_params(t_cfg, seed=0), jnp.bfloat16))
    d_params = jax.device_put(
        cast_params(init_params(d_cfg, seed=1), jnp.bfloat16))

    frontend = LogMelSpectrogram(t_cfg.num_mel_bins)
    rng = np.random.default_rng(0)
    mels = [
        jax.device_put(
            frontend.jit()(
                jnp.asarray(
                    rng.standard_normal((1, N_SAMPLES)).astype(np.float32)
                    * 0.1)).astype(jnp.bfloat16))
        for _ in range(args.utts)
    ]
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens)

    greedy = jax.jit(lambda p, m: transcribe_tokens(p, t_cfg, m, gen))
    np.asarray(greedy(t_params, mels[0])[0])
    # per-call latencies, not one mean-of-total: the round-4 greedy line
    # read ~7x above the bench.py b1 probe and a single aggregate cannot
    # tell a uniformly slow call from one contended straggler — the median
    # + spread makes the measurement self-diagnosing (VERDICT r4 order 5)
    lat = []
    for m in mels:
        t0 = time.perf_counter()
        toks, _ = greedy(t_params, m)
        np.asarray(toks[0, -1])
        lat.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({
        "mode": "greedy", "ms_per_utt": round(float(np.mean(lat)), 1),
        "ms_per_utt_median": round(float(np.median(lat)), 1),
        "ms_min": round(min(lat), 1), "ms_max": round(max(lat), 1),
    }), flush=True)

    for gamma in [int(g) for g in args.gammas.split(",")]:
        speculative_transcribe_tokens(
            t_params, t_cfg, d_params, d_cfg, mels[0], gen, gamma=gamma)
        rounds_total = 0
        t0 = time.perf_counter()
        for m in mels:
            toks, length, rounds, accepted = speculative_transcribe_tokens(
                t_params, t_cfg, d_params, d_cfg, m, gen, gamma=gamma,
                with_stats=True)
            rounds_total += int(np.asarray(rounds))
        ms = (time.perf_counter() - t0) / len(mels) * 1e3
        print(json.dumps({
            "mode": f"spec g={gamma}", "ms_per_utt": round(ms, 1),
            "rounds_per_utt": round(rounds_total / len(mels), 1),
            "ms_per_round": round(ms * len(mels) / max(rounds_total, 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
