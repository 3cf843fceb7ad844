"""Summarization eval: generate continuations with a causal LM and score
ROUGE-1/2/L against references.

Analog of the reference's examples/gpt/summarize.py (cnn_dailymail +
HF GPT-2 + the `evaluate` rouge metric): offline-friendly here — the
dataset is a pickle of (prompt, reference_summary) pairs prepared on a
connected machine, the tokenizer comes from a local HF directory, and the
ROUGE implementation is self-contained (utils/metrics.py::rouge_scores).

Every prompt pads to --max-input-len and runs through the family's ragged
generation (per-row true lengths), so the WHOLE eval compiles exactly one
(batch, max_input_len) executable — per-prompt shapes would pay a
minutes-long remote compile each on TPU.

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

# families whose convert_hf_* takes the HF model and that wire
# generate_ragged (chatglm6b's converter takes a raw state dict instead)
FAMILIES = ("gpt", "llama", "opt", "gptj", "gptneox", "bloom")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="pickle: list of (prompt_text, reference_summary)")
    ap.add_argument("--hf-model", required=True,
                    help="local HF model dir (weights + tokenizer)")
    ap.add_argument("--family", default="gpt", choices=FAMILIES)
    ap.add_argument("--max-new-tokens", type=int, default=100)
    ap.add_argument("--max-input-len", type=int, default=768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--compare-hf", action="store_true")
    args = ap.parse_args()

    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: one cold compile per machine, not per run
    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from transformers import AutoModelForCausalLM, AutoTokenizer

    from whisper_trtllm_tpu.utils.metrics import rouge_scores

    with open(args.dataset, "rb") as f:
        pairs = pickle.load(f)
    if args.limit:
        pairs = pairs[: args.limit]

    tok = AutoTokenizer.from_pretrained(args.hf_model)
    hf = AutoModelForCausalLM.from_pretrained(args.hf_model)
    mod = importlib.import_module(f"whisper_trtllm_tpu.models.{args.family}")
    convert = getattr(mod, [n for n in dir(mod)
                            if n.startswith("convert_hf")][0])
    params, cfg = convert(hf)

    all_ids = [tok(p, truncation=True,
                   max_length=args.max_input_len).input_ids
               for p, _ in pairs]
    refs = [r for _, r in pairs]

    hyps, hf_hyps = [], []
    t0 = time.time()
    for start in range(0, len(all_ids), args.batch):
        chunk = all_ids[start : start + args.batch]
        lens = np.asarray([len(c) for c in chunk], np.int32)
        prompt = np.zeros((len(chunk), args.max_input_len), np.int32)
        for i, c in enumerate(chunk):
            prompt[i, : len(c)] = c
        # pad the final partial chunk to the batch size (one compiled shape)
        if len(chunk) < args.batch:
            pad = args.batch - len(chunk)
            prompt = np.concatenate([prompt, np.ones((pad, args.max_input_len),
                                                     np.int32)], 0)
            lens = np.concatenate([lens, np.ones((pad,), np.int32)])
        out = np.asarray(mod.generate_ragged(
            params, cfg, jnp.asarray(prompt), lens,
            max_new_tokens=args.max_new_tokens))
        for i, c in enumerate(chunk):
            gen = out[i, len(c) : len(c) + args.max_new_tokens]
            hyps.append(tok.decode(gen, skip_special_tokens=True))
        if args.compare_hf:
            import torch

            for c in chunk:
                with torch.no_grad():
                    hf_out = hf.generate(
                        torch.tensor([c]), do_sample=False,
                        max_new_tokens=args.max_new_tokens,
                        pad_token_id=tok.eos_token_id)[0].tolist()
                hf_hyps.append(tok.decode(hf_out[len(c):],
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
