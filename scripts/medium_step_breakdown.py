"""Split medium.en's decode step time by component, on chip.

Each variant runs a 48-iteration fori_loop whose body scans 24 layers of
ONE component (dense matmuls / cross attention / self attention) or the
vocab head, at exactly the decode-step shapes — isolating where the
7.9 ms/step (int8 W+KV, b16) actually goes, since b32 scaling showed the
gap is batch-proportional, not fixed dispatch overhead.

All big arrays are jit ARGUMENTS (closure-captured constants get embedded
into the HLO and overflow the remote-compile tunnel's request limit).

  python scripts/medium_step_breakdown.py [--batch 16] [--float-kv]
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
    ap.add_argument("--float-kv", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_trtllm_tpu.ops.attention import mha_decode_step, quantize_kv

    L, D, FFN, H, DH, T, TS, V = 24, 1024, 4096, 16, 64, 1500, 49, 51864
    B, N = args.batch, args.iters
    rng = np.random.default_rng(0)

    def bf16(*shape, scale=0.05):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * scale, jnp.bfloat16))

    w_dd = bf16(L, 4, D, D)
    w_up = bf16(L, D, FFN)
    w_dn = bf16(L, FFN, D)
    vocab = bf16(V, D)
    ck = bf16(L, B, H, T, DH, scale=0.3)
    cv = bf16(L, B, H, T, DH, scale=0.3)
    sk = bf16(L, B, H, TS, DH, scale=0.3)
    sv = bf16(L, B, H, TS, DH, scale=0.3)
    x0 = bf16(B, D)
    q0 = bf16(B, H, 1, DH, scale=0.12)

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        f(*xs)
        np.asarray(jax.tree_util.tree_leaves(f(*xs))[0].ravel()[0])
        t0 = time.perf_counter()
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"component": name, "total_ms": round(ms, 2),
                          "us_per_step": round(ms / N * 1e3, 1)}), flush=True)

    # 1. dense matmuls only
    def dense_fn(x, w_dd, w_up, w_dn):
        def layer(x, xs):
            wdd, wu, wd = xs
            for j in range(4):
                x = jnp.dot(x, wdd[j], preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            h = jnp.dot(x, wu, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            x = jnp.dot(h, wd, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            return x, None

        def body(x):
            x, _ = jax.lax.scan(layer, x, (w_dd, w_up, w_dn))
            return x

        return jax.lax.fori_loop(0, N, lambda i, x: body(x), x)
    timed("dense_matmuls", dense_fn, x0, w_dd, w_up, w_dn)

    # 2. cross attention only
    if args.float_kv:
        def cross_fn(q, ck, cv):
            def layer(q, xs):
                k, v = xs
                return mha_decode_step(q, k, v, jnp.int32(T)), None

            def body(q):
                q, _ = jax.lax.scan(layer, q, (ck, cv))
                return q

            return jax.lax.fori_loop(0, N, lambda i, q: body(q), q)
        timed("cross_attention_bf16", cross_fn, q0, ck, cv)
    else:
        ckq, cks = quantize_kv(ck, jnp.int8)
        cvq, cvs = quantize_kv(cv, jnp.int8)

        def cross_fn(q, ckq, cks, cvq, cvs):
            def layer(q, xs):
                kq, ks, vq, vs = xs
                return mha_decode_step(q, kq, vq, jnp.int32(T),
                                       k_scale=ks, v_scale=vs), None

            def body(q):
                q, _ = jax.lax.scan(layer, q, (ckq, cks, cvq, cvs))
                return q

            return jax.lax.fori_loop(0, N, lambda i, q: body(q), q)
        timed("cross_attention_int8", cross_fn, q0, ckq, cks, cvq, cvs)

    # 3. self attention only
    def self_fn(q, sk, sv):
        def layer(q, xs):
            k, v = xs
            return mha_decode_step(q, k, v, jnp.int32(20)), None

        def body(q):
            q, _ = jax.lax.scan(layer, q, (sk, sv))
            return q

        return jax.lax.fori_loop(0, N, lambda i, q: body(q), q)
    timed("self_attention", self_fn, q0, sk, sv)

    # 4. vocab head once per step
    def vocab_fn(x, vocab):
        def body(x):
            l = jnp.dot(x, vocab.T, preferred_element_type=jnp.float32)
            return (x + l[:, :D].astype(jnp.bfloat16) * 0).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N, lambda i, x: body(x), x)
    timed("vocab_head", vocab_fn, x0, vocab)


if __name__ == "__main__":
    main()
