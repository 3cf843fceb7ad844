"""Quantified precision-drift study at REAL model dimensions on TPU
(VERDICT r1 item 1b): bf16-vs-fp32 and int8/fp8-KV-vs-float token agreement
and logit drift, with shared random weights — the strongest offline proxy
for the bf16 headline's accuracy cost (real checkpoints need network).

  python scripts/drift_study.py [--preset tiny.en] [--batch 8] [--gen 32] [--utts 32]

Prints one JSON line per preset; paste the table into docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny.en")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gen", type=int, default=32)
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--quant-variant", action="store_true",
                    help="also measure the serving-quantized variant "
                    "(bf16 + int8 KV + int8 vocab table) vs fp32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import (
        cast_params,
        init_params,
    )
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    cfg = WhisperConfig.preset(args.preset)
    params32 = jax.device_put(init_params(cfg, seed=0))
    params16 = jax.device_put(cast_params(init_params(cfg, seed=0),
                                          jnp.bfloat16))
    rng = np.random.default_rng(0)

    enc32 = jax.jit(lambda p, m: wmodel.encode(p, cfg, m))
    dec_full = jax.jit(lambda p, t, e: wmodel.decode_full(p, cfg, t, e))

    n_batches = max(1, args.utts // args.batch)
    report = {"preset": args.preset, "batch": args.batch,
              "gen_tokens": args.gen, "utts": n_batches * args.batch}

    # ---- teacher-forced logit drift (bf16 vs fp32, shared tokens) ----
    mel = rng.standard_normal(
        (args.batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32) * 0.5
    toks = rng.integers(0, cfg.vocab_size, (args.batch, 16)).astype(np.int32)
    e32 = enc32(params32, jnp.asarray(mel))
    e16 = enc32(params16, jnp.asarray(mel, jnp.bfloat16))
    l32 = np.asarray(dec_full(params32, jnp.asarray(toks), e32))
    l16 = np.asarray(dec_full(params16, jnp.asarray(toks), e16)
                     .astype(jnp.float32))
    report["tf_logit_mae_bf16"] = float(np.abs(l32 - l16).mean())
    report["tf_logit_max_bf16"] = float(np.abs(l32 - l16).max())
    report["tf_argmax_agreement_bf16"] = float(
        (l32.argmax(-1) == l16.argmax(-1)).mean())

    # ---- greedy token agreement across precisions ----
    def agree(tokens_a, lens_a, tokens_b, lens_b):
        a, b = np.asarray(tokens_a), np.asarray(tokens_b)
        la, lb = np.asarray(lens_a), np.asarray(lens_b)
        tok_same = total = 0
        text_same = 0
        for i in range(a.shape[0]):
            m = min(int(la[i]), int(lb[i]))
            tok_same += int((a[i, :m] == b[i, :m]).sum())
            total += max(int(la[i]), int(lb[i]))
            text_same += int(la[i] == lb[i]
                             and bool((a[i, :m] == b[i, :m]).all()))
        return tok_same / max(total, 1), text_same, a.shape[0]

    gen32 = GenerationConfig(max_new_tokens=args.gen)
    gen_i8 = GenerationConfig(max_new_tokens=args.gen, kv_cache_dtype="int8")
    gen_f8 = GenerationConfig(max_new_tokens=args.gen, kv_cache_dtype="fp8")

    tot = {"bf16": [0, 0, 0], "int8kv": [0, 0, 0], "fp8kv": [0, 0, 0]}
    for bi in range(n_batches):
        mel = rng.standard_normal(
            (args.batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32) * 0.5
        e32 = enc32(params32, jnp.asarray(mel))
        e16 = enc32(params16, jnp.asarray(mel, jnp.bfloat16))
        t32, len32 = greedy_decode(params32, cfg, e32, gen32)
        t16, len16 = greedy_decode(params16, cfg, e16, gen32)
        t8, len8 = greedy_decode(params16, cfg, e16, gen_i8)
        tf8, lenf8 = greedy_decode(params16, cfg, e16, gen_f8)
        for name, (tk, ln) in [("bf16", (t16, len16)), ("int8kv", (t8, len8)),
                               ("fp8kv", (tf8, lenf8))]:
            frac, same, n = agree(t32, len32, tk, ln)
            tot[name][0] += frac * n
            tot[name][1] += same
            tot[name][2] += n

    if args.quant_variant:
        from whisper_trtllm_tpu.quantization import quantize_vocab_embedding

        params_q = init_params(cfg, seed=0)
        params_q = quantize_vocab_embedding(params_q)
        params_q = jax.device_put(cast_params(params_q, jnp.bfloat16))
        rng_q = np.random.default_rng(0)
        tot["serveq"] = [0, 0, 0]
        for bi in range(n_batches):
            mel = rng_q.standard_normal(
                (args.batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
            ).astype(np.float32) * 0.5
            e32 = enc32(params32, jnp.asarray(mel))
            eq = enc32(params_q, jnp.asarray(mel, jnp.bfloat16))
            t32, len32 = greedy_decode(params32, cfg, e32, gen32)
            tq, lnq = greedy_decode(params_q, cfg, eq, gen_i8)
            frac, same, n = agree(t32, len32, tq, lnq)
            tot["serveq"][0] += frac * n
            tot["serveq"][1] += same
            tot["serveq"][2] += n

    for name, (fsum, same, n) in tot.items():
        report[f"greedy_token_agreement_{name}_vs_fp32"] = round(fsum / n, 4)
        report[f"greedy_exact_transcripts_{name}_vs_fp32"] = f"{same}/{n}"

    print(json.dumps(report))


if __name__ == "__main__":
    main()
