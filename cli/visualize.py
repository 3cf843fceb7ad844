"""Dump the compiled pipeline's program for inspection.

Analog of the reference's examples/gpt/visualize.py (draws the built TRT
engine's layer graph): the TPU equivalents of "the engine graph" are the
jaxpr (framework-level ops), the StableHLO module (what gets compiled),
and the post-optimization HLO (what actually runs, fusions and all).

Usage:
  python -m cli.visualize --checkpoint engines/tiny.en --out graph \
      [--batch 1] [--stage jaxpr|stablehlo|hlo|all] [--max-new-tokens 32]

Writes graph.jaxpr.txt / graph.stablehlo.mlir / graph.hlo.txt.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True, help="output path prefix")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--stage", default="all",
                    choices=["jaxpr", "stablehlo", "hlo", "all"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache for the --stage hlo compile (CLAUDE.md:
    # cold while_loop compiles ride a slow remote tunnel on this platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(args.checkpoint)
    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=args.max_new_tokens),
        RuntimeConfig(compute_dtype=args.dtype),
    )
    mel = jnp.zeros((args.batch, 2 * cfg.max_source_positions,
                     cfg.num_mel_bins), sess._dtype)

    fn = sess._pipeline
    if args.stage in ("jaxpr", "all"):
        txt = str(jax.make_jaxpr(lambda p, m: fn(p, m))(sess.params, mel))
        open(f"{args.out}.jaxpr.txt", "w").write(txt)
        print(f"{args.out}.jaxpr.txt ({len(txt)} chars)")
    if args.stage in ("stablehlo", "hlo", "all"):
        lowered = fn.lower(sess.params, mel)
        if args.stage in ("stablehlo", "all"):
            txt = lowered.as_text()
            open(f"{args.out}.stablehlo.mlir", "w").write(txt)
            print(f"{args.out}.stablehlo.mlir ({len(txt)} chars)")
        if args.stage in ("hlo", "all"):
            txt = lowered.compile().as_text()
            open(f"{args.out}.hlo.txt", "w").write(txt)
            print(f"{args.out}.hlo.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
