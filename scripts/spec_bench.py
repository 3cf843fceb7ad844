"""Speculative decoding wall-clock measurement (VERDICT r3 order 7).

With TRAINED checkpoints (the synthetic-corpus loop, cli/synthetic_asr.py)
the draft's proposals actually match the target, so acceptance — and the
wall-clock claim — is finally measurable instead of analytic. Reports, per
gamma: mean acceptance rate, accepted tokens/round, and batch-1 ms/utt vs
the target's plain greedy decode over the same utterances.

  python scripts/spec_bench.py --target ckpt_base_ft --draft ckpt_tiny_ft \
      --wav-dir /tmp/wtpu_synth4/eval_wavs [--utts 16] [--gammas 2,4,6] \
      [--max-new-tokens 96]

Prints one JSON line per gamma plus a 'greedy' baseline line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def load_wavs(path, n_mels, limit):
    import pathlib
    import wave

    from whisper_trtllm_tpu.audio import log_mel_spectrogram, pad_or_trim

    wavs = sorted(pathlib.Path(path).glob("*.wav"))[:limit]
    mels = []
    for w in wavs:
        with wave.open(str(w), "rb") as f:
            pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        audio = pad_or_trim(pcm.astype(np.float32) / 32768.0)
        mels.append(np.asarray(log_mel_spectrogram(audio,
                                                   num_mel_bins=n_mels))[0])
    return mels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--draft", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--utts", type=int, default=16)
    ap.add_argument("--gammas", default="2,4,6")
    ap.add_argument("--max-new-tokens", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig
    from whisper_trtllm_tpu.models.whisper import cast_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.runtime.speculative import (
        speculative_transcribe_tokens,
    )
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    t_params, t_cfg = load_checkpoint(args.target)
    d_params, d_cfg = load_checkpoint(args.draft)
    dtype = jnp.dtype(args.dtype)
    if dtype != jnp.float32:
        t_params = cast_params(t_params, dtype)
        d_params = cast_params(d_params, dtype)
    t_params = jax.device_put(t_params)
    d_params = jax.device_put(d_params)

    mels = load_wavs(args.wav_dir, t_cfg.num_mel_bins, args.utts)
    mels = [jax.device_put(jnp.asarray(m[None], dtype)) for m in mels]
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens)
    prompt_len = 1 + max([p for p, _ in t_cfg.forced_decoder_ids], default=0)

    # ---- plain greedy target (the baseline the 2.8x projection claimed
    # speculative would beat). Both loops fetch each utterance's tokens to
    # host (the only reliable completion barrier here), so greedy and
    # speculative pay the same per-utt D2H. ----
    greedy = jax.jit(lambda p, m: transcribe_tokens(p, t_cfg, m, gen))
    np.asarray(greedy(t_params, mels[0])[0])        # compile + sync
    # ONE packed D2H window per utterance on both paths: each separate
    # np.asarray costs a full ~24 ms round-trip on this transport, and the
    # r4 protocol charged speculative 4 fetches/utt vs greedy's 2 — a
    # harness artifact worth ~50 ms/utt of phantom speculative cost
    # (same lesson as runtime/ifb.py's packed sync window)
    t0 = time.perf_counter()
    glens, gtoks = [], []
    for m in mels:
        toks, lens = jax.device_get(greedy(t_params, m))
        L = int(lens[0])
        glens.append(L)
        gtoks.append(toks[0, :L])
    g_elapsed = time.perf_counter() - t0
    g_ms = g_elapsed / len(mels) * 1e3
    print(json.dumps({
        "mode": "greedy", "utts": len(mels), "ms_per_utt": round(g_ms, 1),
        "mean_len": round(float(np.mean(glens)), 1), "dtype": args.dtype,
    }), flush=True)

    for gamma in [int(g) for g in args.gammas.split(",")]:
        # compile once
        speculative_transcribe_tokens(
            t_params, t_cfg, d_params, d_cfg, mels[0], gen, gamma=gamma)
        acc_tok = acc_rounds = exact = 0
        lens = []
        t0 = time.perf_counter()
        for i, m in enumerate(mels):
            toks, length, rounds, accepted = jax.device_get(
                speculative_transcribe_tokens(
                    t_params, t_cfg, d_params, d_cfg, m, gen, gamma=gamma,
                    with_stats=True))
            L = int(length[0] if np.ndim(length) else length)
            R = int(rounds)
            lens.append(L)
            acc_tok += int(accepted)                # exact in-loop count
            acc_rounds += R
            exact += int(L == glens[i]
                         and np.array_equal(toks[0, :L], gtoks[i]))
        elapsed = time.perf_counter() - t0
        ms = elapsed / len(mels) * 1e3
        acc_rate = acc_tok / max(gamma * acc_rounds, 1)
        print(json.dumps({
            "mode": f"speculative_g{gamma}", "utts": len(mels),
            "ms_per_utt": round(ms, 1),
            "speedup_vs_greedy": round(g_ms / ms, 2),
            "acceptance_rate": round(acc_rate, 3),
            "accepted_per_round": round(acc_tok / max(acc_rounds, 1), 2),
            "rounds_per_utt": round(acc_rounds / len(mels), 1),
            "mean_len": round(float(np.mean(lens)), 1),
            "token_exact_vs_greedy": exact,
        }), flush=True)


if __name__ == "__main__":
    main()
