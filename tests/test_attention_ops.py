"""Attention-op tier vs torch scaled_dot_product_attention across
batch/seq/mode grids (analog of reference: tests/attention/
test_bert_attention.py:36-150 / test_gpt_attention.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.ops.attention import (
    init_kv_cache,
    mha,
    mha_decode_step,
    update_kv_cache,
)


def _sdpa(q, k, v, is_causal=False, attn_mask=None):
    import torch

    with torch.no_grad():
        return torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=(torch.from_numpy(attn_mask) if attn_mask is not None else None),
            is_causal=is_causal, scale=1.0,  # q pre-scaled, like our op
        ).numpy()


@pytest.mark.parametrize("b,h,s,t", [(1, 2, 8, 8), (3, 4, 16, 16), (2, 2, 5, 11)])
@pytest.mark.parametrize("causal", [False, True])
def test_mha_vs_torch(rng, b, h, s, t, causal):
    if causal and s != t:
        pytest.skip("torch is_causal requires square")
    dh = 16
    q = (rng.standard_normal((b, h, s, dh)) * 0.4).astype(np.float32)
    k = (rng.standard_normal((b, h, t, dh)) * 0.4).astype(np.float32)
    v = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    ours = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=causal))
    theirs = _sdpa(q, k, v, is_causal=causal)
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-5)


def test_mha_mqa_broadcast(rng):
    """multi-query: 1 KV head shared by 4 query heads (reference:
    tensorrt_llm/layers/attention.py:72 multi_query_mode)."""
    b, h, s, dh = 2, 4, 6, 16
    q = (rng.standard_normal((b, h, s, dh)) * 0.4).astype(np.float32)
    k = (rng.standard_normal((b, 1, s, dh)) * 0.4).astype(np.float32)
    v = rng.standard_normal((b, 1, s, dh)).astype(np.float32)
    ours = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    theirs = _sdpa(q, np.repeat(k, h, 1), np.repeat(v, h, 1))
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-5)


def test_additive_mask(rng):
    b, h, s = 2, 2, 7
    dh = 8
    q = (rng.standard_normal((b, h, s, dh)) * 0.4).astype(np.float32)
    k = (rng.standard_normal((b, h, s, dh)) * 0.4).astype(np.float32)
    v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
    mask = np.where(rng.random((b, 1, s, s)) > 0.3, 0.0, -1e9).astype(np.float32)
    ours = np.asarray(
        mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(mask))
    )
    theirs = _sdpa(q, k, v, attn_mask=np.broadcast_to(mask, (b, h, s, s)).copy())
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-5)


def test_incremental_cache_equals_full(rng):
    """Step-by-step cached attention == one full causal pass (the context/
    generation phase equivalence the reference's gpt attention tests check)."""
    b, h, t, dh = 2, 3, 9, 16
    q_all = (rng.standard_normal((b, h, t, dh)) * 0.4).astype(np.float32)
    k_all = (rng.standard_normal((b, h, t, dh)) * 0.4).astype(np.float32)
    v_all = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    full = np.asarray(
        mha(jnp.asarray(q_all), jnp.asarray(k_all), jnp.asarray(v_all), causal=True)
    )
    ck, cv = init_kv_cache(b, h, t, dh)
    steps = []
    for i in range(t):
        ck, cv = update_kv_cache(
            ck, cv, jnp.asarray(k_all[:, :, i:i+1]), jnp.asarray(v_all[:, :, i:i+1]),
            jnp.int32(i),
        )
        steps.append(np.asarray(
            mha_decode_step(jnp.asarray(q_all[:, :, i:i+1]), ck, cv, jnp.int32(i+1))
        ))
    np.testing.assert_allclose(np.concatenate(steps, axis=2), full,
                               atol=2e-6, rtol=1e-5)


def test_decode_step_t_major_matches_default(rng):
    """T-minor (B,H,dh,T) cross-cache layout == the default (B,H,T,dh) —
    float and quantized, scalar and per-lane valid_len. The layout is the
    round-3 cross-KV bandwidth fix (2.38x measured on v5e,
    scripts/cross_attn_probe.py); it must be a pure relayout."""
    from whisper_trtllm_tpu.ops.attention import quantize_kv

    b, h, t, dh = 2, 3, 24, 16
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)) * 0.4, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    for vl in (jnp.int32(t), jnp.asarray([5, t], jnp.int32)):
        ref = np.asarray(mha_decode_step(q, k, v, vl))
        got = np.asarray(mha_decode_step(
            q, jnp.swapaxes(k, -1, -2), jnp.swapaxes(v, -1, -2), vl,
            t_major=True))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)

    kq, ks = quantize_kv(k, jnp.int8)
    vq, vs = quantize_kv(v, jnp.int8)
    for vl in (jnp.int32(t), jnp.asarray([5, t], jnp.int32)):
        ref = np.asarray(mha_decode_step(q, kq, vq, vl, k_scale=ks,
                                         v_scale=vs))
        got = np.asarray(mha_decode_step(
            q, jnp.swapaxes(kq, -1, -2), jnp.swapaxes(vq, -1, -2), vl,
            k_scale=ks, v_scale=vs, t_major=True))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)
