"""Pre-compile deployment graphs into the persistent XLA cache.

The build-time analog of the reference's engine compilation
(reference: Builder.build_engine, tensorrt_llm/builder.py:204): run once per
machine/topology so serving and benchmarking start warm. Useful where cold
compiles are expensive (e.g. remote-compile environments).

Usage:
  python -m cli.warm_cache --model tiny.en --batch 1 16 \
      [--gen-tokens 48 224] [--dtype bfloat16] [--cache-dir /tmp/wtpu_xla_cache]
  python -m cli.warm_cache --checkpoint engines/tiny.en --batch 1 8
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny.en")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--gen-tokens", type=int, nargs="+", default=[48])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--num-beams", type=int, nargs="+", default=[1])
    ap.add_argument("--cache-dir", default="/tmp/wtpu_xla_cache")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession

    if args.checkpoint:
        from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

        params, cfg = load_checkpoint(args.checkpoint)
    else:
        cfg = WhisperConfig.preset(args.model)
        params = init_params(cfg, seed=0)

    for beams in args.num_beams:
        for toks in args.gen_tokens:
            sess = WhisperSession(
                params, cfg,
                GenerationConfig(max_new_tokens=toks, num_beams=beams),
                RuntimeConfig(compute_dtype=args.dtype),
            )
            for b in args.batch:
                t0 = time.time()
                sess.warmup(batch=b)
                print(f"warmed batch={b} tokens={toks} beams={beams} "
                      f"dtype={args.dtype}: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
