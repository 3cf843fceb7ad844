"""Summarization eval: generate continuations with a causal LM and score
ROUGE-1/2/L against references.

Analog of the reference's examples/gpt/summarize.py (cnn_dailymail +
HF GPT-2 + the `evaluate` rouge metric): offline-friendly here — the
dataset is a pickle of (prompt, reference_summary) pairs prepared on a
connected machine, the tokenizer comes from a local HF directory, and the
ROUGE implementation is self-contained (utils/metrics.py::rouge_scores).

Usage:
  python -m cli.summarize --dataset cnn.pkl --hf-model ./gpt2 \
      [--family gpt] [--max-new-tokens 100] [--batch 8] [--limit 100] \
      [--compare-hf]   # also score the HF torch model, like the reference
"""

from __future__ import annotations

import argparse
import json
import pickle
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="pickle: list of (prompt_text, reference_summary)")
    ap.add_argument("--hf-model", required=True,
                    help="local HF model dir (weights + tokenizer)")
    ap.add_argument("--family", default="gpt")
    ap.add_argument("--max-new-tokens", type=int, default=100)
    ap.add_argument("--max-input-len", type=int, default=768)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--compare-hf", action="store_true")
    args = ap.parse_args()

    import importlib

    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from whisper_trtllm_tpu.utils.metrics import rouge_scores

    with open(args.dataset, "rb") as f:
        pairs = pickle.load(f)
    if args.limit:
        pairs = pairs[: args.limit]

    tok = AutoTokenizer.from_pretrained(args.hf_model)
    hf = AutoModelForCausalLM.from_pretrained(args.hf_model)
    mod = importlib.import_module(f"whisper_trtllm_tpu.models.{args.family}")
    convert = getattr(mod, [n for n in dir(mod) if n.startswith("convert_hf")][0])
    params, cfg = convert(hf)

    hyps, refs, hf_hyps = [], [], []
    t0 = time.time()
    for prompt, ref in pairs:
        ids = tok(prompt, truncation=True,
                  max_length=args.max_input_len).input_ids
        out = np.asarray(mod.generate(
            params, cfg, jnp.asarray([ids], jnp.int32),
            max_new_tokens=args.max_new_tokens))[0]
        hyps.append(tok.decode(out[len(ids):], skip_special_tokens=True))
        refs.append(ref)
        if args.compare_hf:
            import torch

            with torch.no_grad():
                hf_out = hf.generate(
                    torch.tensor([ids]), do_sample=False,
                    max_new_tokens=args.max_new_tokens,
                    pad_token_id=tok.eos_token_id)[0].tolist()
            hf_hyps.append(tok.decode(hf_out[len(ids):],
                                      skip_special_tokens=True))
    elapsed = time.time() - t0

    result = {"n": len(pairs), "seconds": round(elapsed, 1),
              **{k: round(v, 4) for k, v in
                 rouge_scores(hyps, refs).items()}}
    if args.compare_hf:
        result["hf"] = {k: round(v, 4)
                        for k, v in rouge_scores(hf_hyps, refs).items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
