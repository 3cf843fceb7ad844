"""Build step: HF checkpoint → framework artifact (weights + config + warmed
compilation cache).

Analog of the reference's engine build (reference:
examples/whisper/build_encoder.py + build_decoder.py): where TRT serializes
an engine per network, here the artifact is a weight snapshot + JSON config,
and the compiled executables land in the JAX persistent compilation cache
(one-time per model/shape/topology).

Usage:
  python -m cli.build --model openai/whisper-tiny.en --output engines/tiny.en \
      [--warmup-batches 1 8] [--cache-dir engines/xla_cache]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF model name/path (e.g. openai/whisper-tiny.en)")
    ap.add_argument("--output", required=True, help="artifact directory")
    ap.add_argument("--warmup-batches", type=int, nargs="*", default=[1],
                    help="batch sizes to AOT-compile")
    ap.add_argument("--cache-dir", default=None,
                    help="persistent XLA compilation cache directory")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--max-new-tokens", type=int, default=224)
    ap.add_argument("--export-engines", action="store_true",
                    help="also write serialized engine files (one per "
                    "warmup batch size) loadable via utils.engine — the "
                    "reference's .engine artifact analog")
    args = ap.parse_args()

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.models.whisper import load_pretrained
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.checkpoint import save_checkpoint
    from whisper_trtllm_tpu.utils.logger import logger

    t0 = time.time()
    params, cfg = load_pretrained(args.model)
    logger.info("loaded %s in %.1fs", args.model, time.time() - t0)

    save_checkpoint(args.output, params, cfg)
    print(f"saved weights+config to {args.output}")

    sess = WhisperSession(
        params, cfg,
        GenerationConfig(max_new_tokens=args.max_new_tokens),
        RuntimeConfig(compute_dtype=args.dtype,
                      persistent_cache_dir=args.cache_dir),
    )
    for b in args.warmup_batches:
        t0 = time.time()
        sess.warmup(batch=b)
        print(f"compiled batch={b} in {time.time() - t0:.1f}s")
        if args.export_engines:
            import os

            path = os.path.join(args.output, f"whisper_b{b}.engine")
            nbytes = sess.export_engine(path, batch=b)
            print(f"serialized engine batch={b}: {path} ({nbytes} bytes)")


if __name__ == "__main__":
    main()
