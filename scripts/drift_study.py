"""Quantified precision-drift study at REAL model dimensions on TPU
(VERDICT r1 item 1b, re-powered per VERDICT r2 order 5): bf16-vs-fp32 and
int8/fp8-KV-vs-float token agreement and logit drift.

Runs ``--seeds`` independent replicates (fresh weights AND fresh mels per
seed unless --checkpoint pins the weights) so every number carries a
run-to-run spread — the r2 table's 16-utterance medium row had error bars
comparable to its signal (int8-KV appeared to *beat* bf16), which only a
spread can expose.

  python scripts/drift_study.py [--preset tiny.en] [--batch 8] [--gen 32]
      [--utts 64] [--seeds 3] [--checkpoint ckpt_dir]

Prints one JSON line; paste the table into docs/PERFORMANCE.md.
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
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--checkpoint", default=None,
                    help="use a trained checkpoint (cli/finetune.py output) "
                    "instead of random weights; seeds then vary only the "
                    "audio")
    ap.add_argument("--audio-dir", default=None,
                    help="16 kHz PCM16 wav dir (cli/synthetic_asr eval set): "
                    "use real in-distribution audio instead of random mels — "
                    "with a trained checkpoint this is the only setting "
                    "where drift is measured at a real logit margin; seeds "
                    "then vary only the batch sampling")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    ckpt_params = None
    if args.checkpoint:
        from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

        ckpt_params, cfg = load_checkpoint(args.checkpoint)
    else:
        cfg = WhisperConfig.preset(args.preset)

    enc32 = jax.jit(lambda p, m: wmodel.encode(p, cfg, m))
    dec_full = jax.jit(lambda p, t, e: wmodel.decode_full(p, cfg, t, e))

    audio_mels = None
    if args.audio_dir:
        from cli.accept import _load_audio_dir

        audio_mels, _ = _load_audio_dir(args.audio_dir, cfg.num_mel_bins)

    def sample_mels(rng):
        """One (batch, 3000, M) mel batch: eval audio when --audio-dir,
        else random noise (the random-weight worst case)."""
        if audio_mels is not None:
            idx = rng.integers(0, len(audio_mels), args.batch)
            return np.asarray(audio_mels[idx], np.float32)
        return rng.standard_normal(
            (args.batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32) * 0.5

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
    n_batches = max(1, args.utts // args.batch)

    per_seed = {"bf16": [], "int8kv": [], "fp8kv": []}
    exact = {"bf16": [], "int8kv": [], "fp8kv": []}
    tf_stats = []
    for seed in range(args.seeds):
        if ckpt_params is not None:
            base = ckpt_params
        else:
            base = init_params(cfg, seed=seed)
        params32 = jax.device_put(base)
        params16 = jax.device_put(cast_params(base, jnp.bfloat16))
        rng = np.random.default_rng(1000 + seed)

        # teacher-forced logit drift for this replicate
        mel = sample_mels(rng)
        toks = rng.integers(0, cfg.vocab_size,
                            (args.batch, 16)).astype(np.int32)
        e32 = enc32(params32, jnp.asarray(mel))
        e16 = enc32(params16, jnp.asarray(mel, jnp.bfloat16))
        l32 = np.asarray(dec_full(params32, jnp.asarray(toks), e32))
        l16 = np.asarray(dec_full(params16, jnp.asarray(toks), e16)
                         .astype(jnp.float32))
        tf_stats.append({
            "mae": float(np.abs(l32 - l16).mean()),
            "max": float(np.abs(l32 - l16).max()),
            "argmax_agree": float((l32.argmax(-1) == l16.argmax(-1)).mean()),
        })

        tot = {"bf16": [0.0, 0, 0], "int8kv": [0.0, 0, 0],
               "fp8kv": [0.0, 0, 0]}
        for bi in range(n_batches):
            mel = sample_mels(rng)
            e32 = enc32(params32, jnp.asarray(mel))
            e16 = enc32(params16, jnp.asarray(mel, jnp.bfloat16))
            t32, len32 = greedy_decode(params32, cfg, e32, gen32)
            t16, len16 = greedy_decode(params16, cfg, e16, gen32)
            t8, len8 = greedy_decode(params16, cfg, e16, gen_i8)
            tf8, lenf8 = greedy_decode(params16, cfg, e16, gen_f8)
            for name, (tk, ln) in [("bf16", (t16, len16)),
                                   ("int8kv", (t8, len8)),
                                   ("fp8kv", (tf8, lenf8))]:
                frac, same, n = agree(t32, len32, tk, ln)
                tot[name][0] += frac * n
                tot[name][1] += same
                tot[name][2] += n
        for name, (fsum, same, n) in tot.items():
            per_seed[name].append(round(fsum / n, 4))
            exact[name].append(f"{same}/{n}")

    report = {"preset": args.preset, "batch": args.batch,
              "gen_tokens": args.gen, "utts_per_seed": n_batches * args.batch,
              "seeds": args.seeds,
              "weights": args.checkpoint or "random (fresh per seed)",
              "audio": args.audio_dir or "random mels"}
    for name in per_seed:
        v = np.asarray(per_seed[name])
        report[f"token_agreement_{name}_vs_fp32"] = {
            "mean": round(float(v.mean()), 4),
            "min": round(float(v.min()), 4),
            "max": round(float(v.max()), 4),
            "per_seed": per_seed[name],
        }
        report[f"exact_transcripts_{name}_vs_fp32"] = exact[name]
    tf = {k: [s[k] for s in tf_stats] for k in tf_stats[0]}
    report["tf_logit_bf16"] = {
        "mae_mean": round(float(np.mean(tf["mae"])), 5),
        "max_of_max": round(float(np.max(tf["max"])), 4),
        "argmax_agree_mean": round(float(np.mean(tf["argmax_agree"])), 4),
        "argmax_agree_per_seed": [round(x, 4) for x in tf["argmax_agree"]],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
