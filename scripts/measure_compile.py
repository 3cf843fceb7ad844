"""Measure COLD compile seconds for the greedy and beam pipelines on the
real chip (VERDICT r1 item 9: beam cold-compile was ~12 min through the
remote-compile tunnel; target < 4 min).

Uses a throwaway compilation-cache dir so the measurement is honestly cold,
and `jit(...).lower(...).compile()` so only compilation (not execution) is
timed.

  python scripts/measure_compile.py [--beams 4] [--batch 8] [--gen 48]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beams", type=int, default=4)
    ap.add_argument("--gen", type=int, default=48)
    ap.add_argument("--warm", action="store_true",
                    help="use the shared persistent cache instead of a "
                    "throwaway dir (measures warm-start)")
    ap.add_argument("--skip-greedy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = ("/tmp/wtpu_xla_cache" if args.warm
             else tempfile.mkdtemp(prefix="wtpu_coldcache_"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime import beam as beam_mod
    from whisper_trtllm_tpu.runtime import generation as gen_mod

    cfg = WhisperConfig.tiny_en()
    params = jax.device_put(cast_params(init_params(cfg, seed=0),
                                        jnp.bfloat16))
    enc_shape = (args.batch, cfg.max_source_positions, cfg.d_model)
    enc = jax.device_put(jnp.zeros(enc_shape, jnp.bfloat16))

    out = {"batch": args.batch, "beams": args.beams, "gen": args.gen,
           "cache": "warm" if args.warm else "cold",
           "backend": jax.default_backend()}

    if not args.skip_greedy:
        g = GenerationConfig(max_new_tokens=args.gen)
        fn = gen_mod._compiled_greedy(cfg, args.gen + 1, False, g)
        t0 = time.perf_counter()
        fn.lower(params, enc).compile()
        out["greedy_compile_s"] = round(time.perf_counter() - t0, 1)

    g = GenerationConfig(max_new_tokens=args.gen, num_beams=args.beams)
    fn = beam_mod._compiled_beam(cfg, args.gen + 1, g)
    t0 = time.perf_counter()
    fn.lower(params, enc).compile()
    out["beam_compile_s"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
