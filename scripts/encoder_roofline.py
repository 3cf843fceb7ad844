"""Encoder phase breakdown + levers (VERDICT r4 order 4).

The decode phase got three rounds of roofline surgery while the encoder —
co-dominant at medium (219 vs 212 ms) and the LARGER phase at large-v3 —
had only an unsourced "~65% MFU" claim. This script publishes the split
(conv stem / attention projections+scores / MLP / residual glue), the
derived encoder MFU, and measures two levers:

  * ``--lever stem-matmul`` — the conv stem lowered as explicit
    unfold+matmul instead of conv_general_dilated (same math; checks
    whether XLA's conv lowering leaves MXU throughput on the table at
    K=3 / C=80..128 shapes, where conv im2col tiling is historically
    weaker than a plain GEMM).
  * ``--lever flash-bq`` — q-block-size sweep of the Pallas flash kernel
    at S=1500 (BQ=64..512; VMEM per program grows with BQ, occupancy
    shrinks).

Part timings are separate jitted callables (a part inside one jit cannot be
timed on TPU); the parts-vs-whole residual is reported as "fusion_glue_ms"
— XLA fuses across sublayer boundaries, so parts may sum above the whole.

  python scripts/encoder_roofline.py --preset medium.en --batch 16 \
      [--reps 5] [--lever stem-matmul] [--lever flash-bq]

Match: the per-size speed story the reference reports
(/root/reference/README.md:93-98); the encoder there is one fused TRT
engine (examples/whisper/build_encoder.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, sync, reps):
    fn()  # warmup (compile)
    sync()
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync_out = fn()
        sync(sync_out)
        lat.append(time.perf_counter() - t0)
    return float(np.median(lat) * 1e3), lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium.en")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--lever", action="append", default=[],
                    choices=["stem-matmul", "flash-bq"])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.benchmarks import roofline
    from whisper_trtllm_tpu.config import WhisperConfig
    from whisper_trtllm_tpu.models.whisper import cast_params, init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel

    cfg = WhisperConfig.preset(args.preset)
    dtype = jnp.dtype(args.dtype)
    params = jax.device_put(cast_params(init_params(cfg, seed=0), dtype))
    B, S, d = args.batch, cfg.max_source_positions, cfg.d_model
    L, ffn, heads = (cfg.encoder_layers, cfg.encoder_ffn_dim,
                     cfg.encoder_attention_heads)
    mels_in = 2 * S

    rng = np.random.default_rng(0)
    mel = jax.device_put(jnp.asarray(
        rng.standard_normal((B, mels_in, cfg.num_mel_bins)) * 0.5, dtype))
    x_mid = jax.device_put(jnp.asarray(
        rng.standard_normal((B, S, d)) * 0.1, dtype))

    def sync(out=None):
        if out is not None:
            np.asarray(out)

    # ---- parts --------------------------------------------------------------
    def stem(p, m):
        enc = p["encoder"]
        x = jax.nn.gelu(wmodel.conv1d(enc["conv1"], m, stride=1, padding=1),
                        approximate=False)
        x = jax.nn.gelu(wmodel.conv1d(enc["conv2"], x, stride=2, padding=1),
                        approximate=False)
        return x + enc["embed_positions"].astype(x.dtype)[None]

    def attn_stack(p, x):
        enc = p["encoder"]

        def body(carry, lp):
            h = wmodel.layer_norm(lp["self_attn_layer_norm"], carry)
            q, k, v = wmodel.attention_qkv(lp["self_attn"], h, None, heads)
            a = wmodel.merge_heads(wmodel.mha(q, k, v, causal=False))
            return carry + wmodel.dense(lp["self_attn"]["out"], a), None

        y, _ = jax.lax.scan(body, x, enc["layers"])
        return y

    def mlp_stack(p, x):
        enc = p["encoder"]

        def body(carry, lp):
            h = wmodel.layer_norm(lp["final_layer_norm"], carry)
            return carry + wmodel.mlp_block(lp, h), None

        y, _ = jax.lax.scan(body, x, enc["layers"])
        return y

    jfull = jax.jit(lambda p, m: wmodel.encode(p, cfg, m))
    jstem = jax.jit(stem)
    jattn = jax.jit(attn_stack)
    jmlp = jax.jit(mlp_stack)

    full_ms, full_lat = timed(lambda: jfull(params, mel)[0, 0, :4],
                              sync, args.reps)
    stem_ms, _ = timed(lambda: jstem(params, mel)[0, 0, :4], sync, args.reps)
    attn_ms, _ = timed(lambda: jattn(params, x_mid)[0, 0, :4], sync, args.reps)
    mlp_ms, _ = timed(lambda: jmlp(params, x_mid)[0, 0, :4], sync, args.reps)

    # ---- analytic FLOPs (B× the per-utterance counts) -----------------------
    conv_f = B * (2 * mels_in * cfg.num_mel_bins * 3 * d + 2 * S * d * 3 * d)
    proj_f = B * L * 4 * 2 * S * d * d
    score_f = B * L * 2 * 2 * S * S * d
    mlp_f = B * L * 2 * 2 * S * d * ffn
    total_f = conv_f + proj_f + score_f + mlp_f

    kind = jax.devices()[0].device_kind
    peak_tflops, hbm_gbps = roofline.chip_peaks(kind)

    def part(name, ms, flops):
        tf = flops / (ms / 1e3) / 1e12 if ms > 0 else None
        return {"name": name, "ms": round(ms, 2),
                "gflops": round(flops / 1e9, 1),
                "achieved_tflops": round(tf, 1) if tf else None,
                "mfu": round(tf / peak_tflops, 3) if tf and peak_tflops
                else None}

    parts = [
        part("full_encoder", full_ms, total_f),
        part("conv_stem", stem_ms, conv_f),
        part("attention(stack)", attn_ms, proj_f + score_f),
        part("mlp(stack)", mlp_ms, mlp_f),
    ]
    out = {
        "preset": args.preset, "batch": B, "dtype": args.dtype,
        "device": kind, "peak_bf16_tflops": peak_tflops,
        "parts": parts,
        "fusion_glue_ms": round(full_ms - (stem_ms + attn_ms + mlp_ms), 2),
        "full_spread_ms": [round(x * 1e3, 2) for x in sorted(full_lat)],
    }
    print(json.dumps(out), flush=True)

    # ---- lever: conv stem as unfold+matmul ----------------------------------
    if "stem-matmul" in args.lever:
        def stem_mm(p, m):
            enc = p["encoder"]

            def conv_as_mm(blk, x, stride):
                k, cin, cout = blk["kernel"].shape
                assert k == 3
                xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
                t_out = x.shape[1] // stride
                frames = jnp.concatenate(
                    [xp[:, s0:s0 + stride * t_out:stride] for s0 in range(3)],
                    axis=-1)                       # (B, T_out, 3*Cin)
                w = blk["kernel"].transpose(0, 1, 2).reshape(3 * cin, cout)
                y = frames @ w.astype(frames.dtype)
                if "bias" in blk and blk["bias"] is not None:
                    y = y + blk["bias"].astype(y.dtype)
                return y

            x = jax.nn.gelu(conv_as_mm(enc["conv1"], m, 1), approximate=False)
            x = jax.nn.gelu(conv_as_mm(enc["conv2"], x, 2), approximate=False)
            return x + enc["embed_positions"].astype(x.dtype)[None]

        jstem_mm = jax.jit(stem_mm)
        ref = np.asarray(jstem(params, mel), np.float32)
        got = np.asarray(jstem_mm(params, mel), np.float32)
        max_err = float(np.max(np.abs(ref - got)))
        mm_ms, _ = timed(lambda: jstem_mm(params, mel)[0, 0, :4],
                         sync, args.reps)
        print(json.dumps({
            "lever": "stem-matmul", "conv_ms": round(stem_ms, 2),
            "matmul_ms": round(mm_ms, 2),
            "speedup": round(stem_ms / mm_ms, 2) if mm_ms > 0 else None,
            "max_abs_err": max_err,
        }), flush=True)

    # ---- lever: flash q-block sweep -----------------------------------------
    if "flash-bq" in args.lever:
        from whisper_trtllm_tpu.ops.pallas import flash_attention as fa

        orig = fa.BQ
        try:
            for bq in (64, 128, 256, 512):
                fa.BQ = bq
                jsweep = jax.jit(attn_stack)
                try:
                    ms, _ = timed(lambda: jsweep(params, x_mid)[0, 0, :4],
                                  sync, args.reps)
                    print(json.dumps({"lever": "flash-bq", "bq": bq,
                                      "attn_stack_ms": round(ms, 2)}),
                          flush=True)
                except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
                    print(json.dumps({"lever": "flash-bq", "bq": bq,
                                      "error": str(e)[:120]}), flush=True)
        finally:
            fa.BQ = orig


if __name__ == "__main__":
    main()
