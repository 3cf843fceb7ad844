"""Cross-attention decode-step bandwidth probe at medium.en dims.

The medium decode step is cross-KV-read dominated (~1.2 GB/step int8 at
b16: VERDICT r2). This probe establishes, on chip:

  1. the practical HBM streaming ceiling for the exact cross-KV arrays
     (a pure reduce-read of the same bytes — XLA's best case);
  2. what the current einsum formulation achieves ((B,H,T,dh), dh=64 minor);
  3. whether a transposed (B,H,dh,T) layout (T minor: full 128-lane tiles
     for int8 instead of a half-empty dh=64 minor) closes the gap;
  4. an int4 cross-KV variant (halves the bytes again).

Each timed region runs N=48 chained steps (one medium decode's worth) over
all 24 layers via scan, so per-call dispatch amortizes exactly like the
real decode loop. One JSON line per variant.

  python scripts/cross_attn_probe.py [--batch 16] [--iters 48]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--layers", type=int, default=24,
                    help="24 = medium.en; 32 = large-v3")
    ap.add_argument("--heads", type=int, default=16,
                    help="16 = medium.en; 20 = large-v3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.ops.attention import mha_decode_step, quantize_kv

    L, H, DH, T = args.layers, args.heads, 64, 1500
    B, N = args.batch, args.iters
    rng = np.random.default_rng(0)

    def bf16(*shape, scale=0.3):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * scale, jnp.bfloat16))

    ck = bf16(L, B, H, T, DH)
    cv = bf16(L, B, H, T, DH)
    q0 = bf16(B, H, 1, DH, scale=0.12)
    ckq, cks = quantize_kv(ck, jnp.int8)
    cvq, cvs = quantize_kv(cv, jnp.int8)
    hbm_gbps = 819.0

    def timed(name, nbytes_step, fn, *xs):
        f = jax.jit(fn)
        f(*xs)
        np.asarray(jax.tree_util.tree_leaves(f(*xs))[0].ravel()[0])
        t0 = time.perf_counter()
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ms = (time.perf_counter() - t0) * 1e3
        us_step = ms / N * 1e3
        gbps = nbytes_step / (us_step * 1e-6) / 1e9
        print(json.dumps({
            "variant": name,
            "us_per_step": round(us_step, 1),
            "achieved_gbps": round(gbps, 1),
            "bw_frac": round(gbps / hbm_gbps, 3),
        }), flush=True)

    int8_bytes = 2 * L * B * H * T * DH          # K+V int8 per step
    # scales are read too but tiny: L*B*H*T*4 ≈ 2.4 MB vs 1180 MB

    # 1. pure streaming ceiling: reduce-read the same int8 arrays
    def stream_fn(kq, vq):
        def body(i, acc):
            def layer(acc, xs):
                k, v = xs
                s = jnp.sum(k, dtype=jnp.int32) + jnp.sum(v, dtype=jnp.int32)
                return acc + s, None
            acc, _ = jax.lax.scan(layer, acc, (kq, vq))
            return acc
        return jax.lax.fori_loop(0, N, lambda i, a: body(i, a), jnp.int32(0))
    timed("stream_ceiling_int8", int8_bytes, stream_fn, ckq, cvq)

    # 2. current path: mha_decode_step with folded int8 scales
    def cur_fn(q, kq, ks, vq, vs):
        def layer(q, xs):
            kq_, ks_, vq_, vs_ = xs
            return mha_decode_step(q, kq_, vq_, jnp.int32(T),
                                   k_scale=ks_, v_scale=vs_), None
        def body(q):
            q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
            return q
        return jax.lax.fori_loop(0, N, lambda i, q: body(q), q0)
    timed("current_int8_bhtd", int8_bytes, cur_fn, q0, ckq, cks, cvq, cvs)

    # 3. transposed layout: K and V stored (B, H, dh, T) — T minor fills
    # 128-lane tiles completely for int8 (dh=64 minor leaves them half empty)
    ckq_t = jax.device_put(jnp.swapaxes(ckq, -1, -2))   # (L,B,H,DH,T)
    cvq_t = jax.device_put(jnp.swapaxes(cvq, -1, -2))
    cks_t = jax.device_put(cks[..., 0])                 # (L,B,H,T)
    cvs_t = jax.device_put(cvs[..., 0])

    def t_fn(q, kq, ks, vq, vs):
        def layer(q, xs):
            kq_, ks_, vq_, vs_ = xs                     # (B,H,DH,T),(B,H,T)
            scores = jnp.einsum(
                "bhqd,bhdt->bhqt", q, kq_.astype(q.dtype),
                preferred_element_type=jnp.float32) * ks_[:, :, None, :]
            w = jax.nn.softmax(scores, axis=-1)
            w = (w * vs_[:, :, None, :]).astype(q.dtype)
            o = jnp.einsum("bhqt,bhdt->bhqd", w, vq_.astype(q.dtype),
                           preferred_element_type=q.dtype)
            return o, None
        def body(q):
            q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
            return q
        return jax.lax.fori_loop(0, N, lambda i, q: body(q), q0)
    timed("transposed_int8_bhdt", int8_bytes, t_fn,
          q0, ckq_t, cks_t, cvq_t, cvs_t)

    # 4. int4 cross-KV (if supported by this toolchain): half the bytes
    try:
        ck4 = jax.device_put(
            jnp.clip(jnp.round(ckq.astype(jnp.float32) / 16.0),
                     -7, 7).astype(jnp.int4))
        cv4 = jax.device_put(
            jnp.clip(jnp.round(cvq.astype(jnp.float32) / 16.0),
                     -7, 7).astype(jnp.int4))

        def i4_fn(q, k4, ks, v4, vs):
            def layer(q, xs):
                k_, ks_, v_, vs_ = xs
                scores = jnp.einsum(
                    "bhqd,bhtd->bhqt", q, k_.astype(q.dtype),
                    preferred_element_type=jnp.float32
                ) * ks_[..., 0][:, :, None, :]
                w = jax.nn.softmax(scores, axis=-1)
                w = (w * vs_[..., 0][:, :, None, :]).astype(q.dtype)
                o = jnp.einsum("bhqt,bhtd->bhqd", w, v_.astype(q.dtype),
                               preferred_element_type=q.dtype)
                return o, None
            def body(q):
                q, _ = jax.lax.scan(layer, q, (k4, ks, v4, vs))
                return q
            return jax.lax.fori_loop(0, N, lambda i, q: body(q), q0)
        timed("int4_bhtd", int8_bytes // 2, i4_fn, q0, ck4, cks, cv4, cvs)
    except Exception as e:  # int4 unsupported → report, don't crash
        print(json.dumps({"variant": "int4_bhtd",
                          "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
