"""WER evaluation over a cached LibriSpeech pickle.

Analog of the reference's cal_wer.py (reference:
examples/whisper/cal_wer.py:249-287): load (mel, text) pairs, greedy decode,
normalize hypothesis and reference, report corpus WER.

Usage:
  python -m cli.cal_wer --checkpoint engines/tiny.en \
      --dataset librispeech.cache --hf-model openai/whisper-tiny.en [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--hf-model", required=True, help="for the tokenizer")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=224)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from transformers import WhisperTokenizerFast

    from cli.transcribe import _batches, _load_dataset
    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint
    from whisper_trtllm_tpu.utils.metrics import get_text_normalizer, word_error_rate

    params, cfg = load_checkpoint(args.checkpoint)
    sess = WhisperSession(
        params, cfg,
        GenerationConfig(max_new_tokens=args.max_new_tokens,
                         num_beams=args.num_beams),
        RuntimeConfig(compute_dtype=args.dtype),
    )
    tokenizer = WhisperTokenizerFast.from_pretrained(args.hf_model)
    normalize = get_text_normalizer()

    mels, texts = _load_dataset(args.dataset, cfg.num_mel_bins)
    n = len(mels)
    hyps = []
    t0 = time.perf_counter()
    for mb in _batches(mels, args.batch):
        pad = args.batch - len(mb)
        if pad:
            mb = np.concatenate([mb, np.repeat(mb[-1:], pad, 0)])
        tokens, lengths = sess.transcribe_features(mb)
        for b in range(len(tokens) - pad):
            ids = tokens[b, 1 : lengths[b]]
            ids = ids[ids != cfg.eos_token_id]
            hyps.append(tokenizer.decode(ids, skip_special_tokens=True))
    elapsed = time.perf_counter() - t0

    refs = [normalize(t) for t in texts[:len(hyps)]]
    hyps_n = [normalize(h) for h in hyps]
    wer = word_error_rate(hyps_n, refs)
    print(f"WER: {wer * 100:.2f}%  ({n} utterances, {elapsed:.1f}s, "
          f"{n * 30.0 / elapsed:.1f} audio-s/s)")


if __name__ == "__main__":
    main()
