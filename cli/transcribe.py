"""Serving/eval CLI: transcribe a dataset, optionally differential-test
against HF transformers.

Analog of the reference's run.py (reference: examples/whisper/run.py:229-331):
same two-pass protocol (warmup + timed), same --compare exact-transcript
differential report, but batched and fully on-device.

Usage:
  python -m cli.transcribe --checkpoint engines/tiny.en \
      [--dataset librispeech.cache] [--batch 8] [--num-beams 1] [--compare]

The dataset is a pickle of (mel | audio, text) pairs (see cli/get_librispeech.py).
Without --dataset, synthetic audio is used (shape/perf smoke run).
"""

from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def _load_dataset(path, n_mels):
    """Returns (mels (N, 3000, M) float32, texts list[str])."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    mels, texts = [], []
    for item in data:
        mel, text = item[0], item[1]
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 3:
            mel = mel[0]
        if mel.shape[0] == n_mels:  # (M, T) → (T, M)
            mel = mel.T
        mels.append(mel)
        texts.append(text)
    return np.stack(mels), texts


def _batches(x, batch):
    for i in range(0, len(x), batch):
        yield x[i : i + batch]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=224)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--kv-cache-dtype", default="auto",
                    choices=["auto", "int8", "fp8"])
    ap.add_argument("--compare", action="store_true",
                    help="differential test vs HF transformers (CPU torch)")
    ap.add_argument("--hf-model", default=None,
                    help="HF model for --compare / tokenizer")
    args = ap.parse_args()

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(args.checkpoint)
    sess = WhisperSession(
        params, cfg,
        GenerationConfig(max_new_tokens=args.max_new_tokens,
                         num_beams=args.num_beams,
                         kv_cache_dtype=args.kv_cache_dtype),
        RuntimeConfig(compute_dtype=args.dtype),
    )

    if args.dataset:
        mels, texts = _load_dataset(args.dataset, cfg.num_mel_bins)
    else:
        rng = np.random.default_rng(0)
        mels = rng.standard_normal(
            (8, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32) * 0.1
        texts = [""] * len(mels)

    # pad the tail batch to a compiled shape
    batch = args.batch
    n = len(mels)

    def run_pass():
        outs = []
        t0 = time.perf_counter()
        for mb in _batches(mels, batch):
            pad = batch - len(mb)
            if pad:
                mb = np.concatenate([mb, np.repeat(mb[-1:], pad, 0)])
            tokens, lengths = sess.transcribe_features(mb)
            outs.append((tokens, lengths))
        elapsed = time.perf_counter() - t0
        return outs, elapsed

    run_pass()                       # warmup (reference protocol run.py:259-291)
    outs, elapsed = run_pass()
    audio_s = n * 30.0
    print(f"{n} utterances in {elapsed:.2f}s → "
          f"{audio_s / elapsed:.1f} audio-s/s, "
          f"{elapsed / n * 1e3:.1f} ms/utt")

    tokenizer = None
    if args.hf_model:
        try:
            from transformers import WhisperTokenizerFast

            tokenizer = WhisperTokenizerFast.from_pretrained(args.hf_model)
        except Exception as e:
            print(f"(no tokenizer: {e})")

    hyps = []
    idx = 0
    for tokens, lengths in outs:
        for b in range(len(tokens)):
            if idx >= n:
                break
            ids = tokens[b, 1 : lengths[b]]
            ids = ids[ids != cfg.eos_token_id]
            if tokenizer is not None:
                hyps.append(tokenizer.decode(ids, skip_special_tokens=True))
            else:
                hyps.append(" ".join(map(str, ids)))
            idx += 1

    if args.compare:
        import torch
        from transformers import WhisperForConditionalGeneration

        hf = WhisperForConditionalGeneration.from_pretrained(
            args.hf_model or args.checkpoint
        ).eval()
        same = diff = 0
        t0 = time.perf_counter()
        with torch.no_grad():
            for i in range(n):
                out = hf.generate(
                    input_features=torch.from_numpy(mels[i].T[None]),
                    max_new_tokens=args.max_new_tokens,
                    num_beams=args.num_beams, do_sample=False,
                )
                ref = (tokenizer.decode(out[0], skip_special_tokens=True)
                       if tokenizer else " ".join(map(str, out[0].numpy())))
                if ref.strip() == hyps[i].strip():
                    same += 1
                else:
                    diff += 1
                    print(f"[diff utt {i}]\n  ours:   {hyps[i]}\n  theirs: {ref}")
        hf_elapsed = time.perf_counter() - t0
        print(f"same: {same}  diff: {diff}  (HF pass {hf_elapsed:.2f}s, "
              f"speedup {hf_elapsed / elapsed:.2f}x)")
    else:
        for i, h in enumerate(hyps[: min(n, 5)]):
            print(f"[{i}] {h}")


if __name__ == "__main__":
    main()
