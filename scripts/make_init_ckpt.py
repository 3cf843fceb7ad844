"""Create a random-init Whisper checkpoint for the synthetic-ASR training
pipeline (round-5: durable speculative draft/target pairs).

The synthetic corpus (cli/synthetic_asr.py) bakes one HF dir + one tiny.en
init checkpoint; training a DIFFERENT architecture (the 2L/d192 "micro"
speculative draft, or a base.en-dim target) on the same corpus needs an
init checkpoint at those dims sharing the tiny.en token configuration
(vocab 51864, forced ``<|notimestamps|>``, suppress lists) so draft and
target propose/verify in the same token space — the constraint the
reference's draft/target pairing implies (draft must share the tokenizer).

  python scripts/make_init_ckpt.py --preset base.en --output /tmp/ckpt_base_init
  python scripts/make_init_ckpt.py --preset tiny.en --micro-draft \
      --output /tmp/ckpt_micro_init
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny.en")
    ap.add_argument("--micro-draft", action="store_true",
                    help="shrink the preset to the round-4 'micro' "
                    "speculative-draft shape (2 layers, d192, 3 heads, "
                    "ffn 768) keeping its token configuration")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # init needs no accelerator

    from whisper_trtllm_tpu.config import WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.utils.checkpoint import save_checkpoint

    cfg = WhisperConfig.preset(args.preset)
    if args.micro_draft:
        cfg = dataclasses.replace(
            cfg, d_model=192, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=3, decoder_attention_heads=3,
            encoder_ffn_dim=768, decoder_ffn_dim=768)
    params = init_params(cfg, seed=args.seed)
    save_checkpoint(args.output, params, cfg)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"output": args.output, "preset": args.preset,
                      "micro_draft": bool(args.micro_draft),
                      "params_m": round(n / 1e6, 2)}))


if __name__ == "__main__":
    main()
