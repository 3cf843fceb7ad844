"""Attention ops (XLA path) over (B, H, S, dh) tensors.

This single masked, static-shape formulation subsumes the reference's entire
attention surface:

- encoder bidirectional MHA (reference: bertAttentionPlugin,
  cpp/tensorrt_llm/plugins/bertAttentionPlugin/bertAttentionPlugin.cpp);
- the 4-mode ``WhisperDecoderAttention`` self/cross × with/without-KV-cache
  matrix (reference: tensorrt_llm/models/whisper/model.py:153-304), which the
  reference encodes through the *shape* of a dummy cache-mask tensor
  (model.py:264,278) because TRT cannot branch on values. On TPU the cache is
  a fixed-size buffer plus an integer length and a mask — no dynamic shapes,
  no recompilation (SURVEY.md §7 design inversion 2);
- the generation-phase masked MHA kernel
  (reference: cpp/tensorrt_llm/kernels/decoderMaskedMultiheadAttention*).

Pallas fused variants for the hot paths live in ops/pallas/.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from whisper_trtllm_tpu.ops.functional import softmax_fp32


def _use_pallas() -> bool:
    from whisper_trtllm_tpu.ops.pallas import pallas_enabled

    return pallas_enabled()


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    fp32_softmax: bool = True,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Full-sequence attention. q: (B, H, S, dh); k, v: (B, Hkv, T, dh).

    ``Hkv`` may be 1 (multi-query, reference:
    tensorrt_llm/layers/attention.py:72,112-120) or divide H (grouped-query).
    ``q`` is expected pre-scaled by dh**-0.5 (Whisper convention). ``mask``
    is additive (0 / -inf), broadcastable to (B, H, S, T).

    On the TPU backend the bidirectional unmasked case dispatches to the
    fused Pallas flash kernel (1.5x the XLA lowering at Whisper encoder
    shapes; kill switch WHISPER_TPU_DISABLE_PALLAS=1). ``use_flash=False``
    pins the XLA lowering for callers that need bitwise parity with the
    decode-step path (mha_decode_step has no flash variant).
    """
    b, h, s, dh = q.shape
    hkv = k.shape[1]
    if (
        use_flash
        and mask is None
        and h % hkv == 0
        and s > 1
        and dh % 8 == 0
        and (not causal or (s == k.shape[2] and s >= 768))
        and _use_pallas()
    ):
        # bidirectional (encoder) or causal square (context-phase prefill —
        # the reference's causal context FMHA, reference:
        # cpp/tensorrt_llm/kernels/contextFusedMultiHeadAttention/).
        # The causal variant engages only at S >= 768: measured on v5e it
        # wins 1.5x at S=1024 (1161 vs 1748 us) but loses below ~700
        # (783 vs 631 us at S=512) where the XLA lowering's materialized
        # scores still fit caches comfortably — docs/PERFORMANCE.md.
        from whisper_trtllm_tpu.ops.pallas.flash_attention import flash_mha

        return flash_mha(q, k, v, causal=causal)
    if hkv != h:
        assert h % hkv == 0
        k = jnp.repeat(k, h // hkv, axis=1)
        v = jnp.repeat(v, h // hkv, axis=1)
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    )
    if causal:
        t = k.shape[2]
        causal_mask = jnp.tril(jnp.ones((s, t), dtype=bool), k=t - s)
        scores = jnp.where(causal_mask[None, None], scores, jnp.float32(-1e9))
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    if fp32_softmax:
        weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    else:
        weights = jax.nn.softmax(scores.astype(q.dtype), axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", weights, v, preferred_element_type=q.dtype)


def init_kv_cache(
    batch: int, heads: int, max_len: int, head_dim: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Preallocated static KV cache (B, H, max_len, dh) ×2. The analog of the
    reference's per-step growing past tensors
    (reference: tensorrt_llm/models/whisper/model.py:427-437) and the paged
    KVCacheManager pool (reference:
    tensorrt_llm/runtime/kv_cache_manager.py:214-292)."""
    shape = (batch, heads, max_len, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def update_kv_cache(
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    pos: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-place (donated) write of the current step's K/V at position ``pos``.
    k_new/v_new: (B, H, 1, dh). ``pos`` is a scalar (lockstep batch) or a
    (B,) vector (ragged/in-flight batches — per-lane write offsets)."""
    if getattr(pos, "ndim", 0) == 1:
        def upd(c, n, p):
            return jax.lax.dynamic_update_slice(
                c, n.astype(c.dtype), (jnp.zeros((), jnp.int32), p, jnp.zeros((), jnp.int32))
            )

        vupd = jax.vmap(upd, in_axes=(0, 0, 0))
        return (
            vupd(cache_k, k_new, pos.astype(jnp.int32)),
            vupd(cache_v, v_new, pos.astype(jnp.int32)),
        )
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, zero, pos.astype(jnp.int32), zero)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype), idx)
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype), idx)
    return cache_k, cache_v


def quantize_kv(x: jnp.ndarray,
                dtype=jnp.int8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token-per-head symmetric quantization of K/V states (reduced
    over head_dim) to int8 or float8_e4m3fn. Analog of the reference's
    INT8_KV_CACHE / FP8_KV_CACHE modes (reference:
    tensorrt_llm/layers/attention.py int8 KV quant/dequant +
    QuantMode.{INT8,FP8}_KV_CACHE, quantization/mode.py:17-18,61-66).
    Returns (quantized values, fp32 scales with a trailing keepdim); the
    consumer recovers float via ``values.astype(f32) * scale`` either way,
    so `mha_decode_step`'s k_scale/v_scale path serves both."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
    else:
        # e4m3fn: max finite 448; scaling amax onto it keeps the cast exact
        # at the extremes (no saturate-to-nan in a format without inf)
        scale = jnp.maximum(amax, 1e-8) / 448.0
        q = (x.astype(jnp.float32) / scale).astype(dtype)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """int8 cache → compute dtype; XLA fuses the convert+mul into the
    attention dot, so HBM reads stay int8 (4x less cache traffic than fp32)."""
    return q.astype(dtype) * scale.astype(dtype)


def mha_decode_step(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    valid_len: jnp.ndarray,
    fp32_softmax: bool = True,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    t_major: bool = False,
) -> jnp.ndarray:
    """Single-token attention against a static cache.

    q: (B, H, 1, dh); cache: (B, H, Tmax, dh); valid_len: scalar int — number
    of valid cache positions. Positions >= valid_len are masked out, which is
    how one static shape serves every step (and both self- and cross-
    attention: for cross, valid_len is the constant encoder length).

    ``t_major``: caches are stored (B, H, dh, Tmax) — the T-minor layout
    that fills full 128-lane HBM tiles (a dh=64 minor dim leaves int8
    (32,128) and bf16 (16,128) tiles half-empty, so every read moves ~2x
    the useful bytes). Measured on v5e at medium.en dims b16 int8: 208 GB/s
    effective (25% of HBM) for the dh-minor layout vs 495 GB/s (60%) for
    T-minor — 2.38x per decode step (scripts/cross_attn_probe.py). Used for
    the cross-attention cache, whose full-T read dominates decode traffic;
    scales keep their (B, H, Tmax, 1) shape either way.

    ``bias``: optional additive score bias broadcastable to (B, H, 1, Tmax)
    — the ALiBi path (the reference's gptAttention plugin takes the same
    per-head alibi slopes, reference: tensorrt_llm/layers/attention.py
    alibi + functional.py:3222-3283).

    ``valid_len`` may also be a per-lane (B,) vector (ragged batches, the
    in-flight-batching case — analog of ibGptAttentionPlugin's per-request
    cache lengths, reference: cpp/tensorrt_llm/plugins/ibGptAttentionPlugin/).

    The Pallas decode kernel (ops/pallas/decode_attention.py) is available
    but NOT dispatched here: profiled on v5e inside the scanned layer body it
    loses to the XLA lowering (46.6 vs 29.8 ms per 48-step batch-8 loop —
    per-call dispatch overhead dominates at one token per step), while the
    encoder flash kernel wins. Opt in via WHISPER_TPU_FORCE_PALLAS_DECODE=1.
    """
    import os

    per_lane = getattr(valid_len, "ndim", 0) == 1
    if t_major:
        t = cache_k.shape[3]
        if k_scale is not None:
            scores = jnp.einsum(
                "bhqd,bhdt->bhqt", q, cache_k.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) * k_scale[..., 0][:, :, None, :]
        else:
            scores = jnp.einsum(
                "bhqd,bhdt->bhqt", q, cache_k,
                preferred_element_type=jnp.float32,
            )
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        pos_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        vl = valid_len[:, None, None, None] if per_lane else valid_len
        scores = jnp.where(pos_ids < vl, scores, jnp.float32(-1e9))
        if fp32_softmax or k_scale is not None:
            # quantized caches always use fp32 softmax so layout invariance
            # (T-minor == dh-minor, tests/test_realdim_parity.py) holds at
            # every fp32_softmax value — the quantized dh-minor path below
            # is unconditionally fp32
            weights = jax.nn.softmax(scores, axis=-1)
        else:
            weights = jax.nn.softmax(scores.astype(q.dtype), axis=-1)
        if v_scale is not None:
            weights = (weights * v_scale[..., 0][:, :, None, :]).astype(
                q.dtype)
            cache_v = cache_v.astype(q.dtype)
        else:
            weights = weights.astype(q.dtype)
        return jnp.einsum(
            "bhqt,bhdt->bhqd", weights, cache_v,
            preferred_element_type=q.dtype,
        )
    if k_scale is not None:
        # int8 KV cache. Do NOT materialize a dequantized cache (XLA would
        # write/read the full-size float tensor each step, which measured
        # *slower* than float caches on v5e). The per-token scales commute
        # out of both contractions instead:
        #   q·(k_q s)ᵀ = (q·k_qᵀ) ⊙ sᵀ      and      p·(v_q s) = (p ⊙ sᵀ)·v_q
        # so only int8 bytes cross HBM; the int8→f32 convert alone fuses
        # into the dot operands.
        scores = jnp.einsum(
            "bhqd,bhtd->bhqt", q, cache_k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * k_scale[..., 0][:, :, None, :]              # (B,H,1,T)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        t = cache_k.shape[2]
        pos_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        vl = valid_len[:, None, None, None] if per_lane else valid_len
        scores = jnp.where(pos_ids < vl, scores, jnp.float32(-1e9))
        weights = jax.nn.softmax(scores, axis=-1)
        weights = (weights * v_scale[..., 0][:, :, None, :]).astype(q.dtype)
        return jnp.einsum(
            "bhqt,bhtd->bhqd", weights, cache_v.astype(q.dtype),
            preferred_element_type=q.dtype,
        )
    if (
        not per_lane
        and bias is None
        and cache_k.shape[2] % 8 == 0
        and cache_k.dtype != jnp.int8
        and os.environ.get("WHISPER_TPU_FORCE_PALLAS_DECODE") == "1"
        and _use_pallas()
    ):
        from whisper_trtllm_tpu.ops.pallas.decode_attention import decode_mha

        return decode_mha(q, cache_k, cache_v, valid_len)
    scores = jnp.einsum(
        "bhqd,bhtd->bhqt", q, cache_k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    t = cache_k.shape[2]
    pos_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
    vl = valid_len[:, None, None, None] if per_lane else valid_len
    scores = jnp.where(pos_ids < vl, scores, jnp.float32(-1e9))
    if fp32_softmax:
        weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    else:
        weights = jax.nn.softmax(scores.astype(q.dtype), axis=-1)
    return jnp.einsum(
        "bhqt,bhtd->bhqd", weights, cache_v, preferred_element_type=q.dtype
    )

def init_paged_kv_cache(
    num_blocks: int, tokens_per_block: int, heads: int, head_dim: int,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paged K/V pools, (num_blocks, tokens_per_block, H, dh) ×2 — the
    device half of the paged KV cache (reference: the per-layer memory pools
    fed to KVCacheManager, tensorrt_llm/runtime/generation.py:842-855; block
    addressing there is raw pointers, here pool indices from
    runtime/kv_cache_manager.py block tables). Layout puts tokens_per_block
    before heads so a block gather yields (…, tpb, H, dh) windows that
    reshape to a (B, S, H, dh) attention operand without data movement."""
    shape = (num_blocks, tokens_per_block, heads, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def paged_update_kv_cache(
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    pos: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write one decode step's K/V through the block table (the cache-append
    the gptAttention plugin does against pointer arrays in paged mode,
    reference: cpp/tensorrt_llm/plugins/gptAttentionCommon/ paged-KV branch).

    k_new/v_new: (B, H, 1, dh); block_tables: (B, max_blocks_per_seq) int32;
    pos: per-lane (B,) or scalar token positions. Each lane writes pool slot
    [table[pos // tpb], pos % tpb]. Donate the pools for in-place updates.

    Lanes whose table entry is -1 or whose pos falls outside the table's
    coverage write NOTHING (scatter mode='drop') — in a continuous batcher a
    retired lane keeps stepping until its slot is refilled, and its freed
    blocks may already belong to another request."""
    n, tpb, h, dh = pool_k.shape
    b = k_new.shape[0]
    m = block_tables.shape[1]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b,))
    blocks = jnp.take_along_axis(
        block_tables, jnp.clip(pos // tpb, 0, m - 1)[:, None], axis=1)[:, 0]
    flat = blocks * tpb + pos % tpb
    valid = (blocks >= 0) & (pos >= 0) & (pos < m * tpb)
    flat = jnp.where(valid, flat, n * tpb)  # out of range -> dropped
    kv_shape = (n * tpb, h, dh)
    pool_k = pool_k.reshape(kv_shape).at[flat].set(
        k_new[:, :, 0, :].astype(pool_k.dtype),
        mode="drop").reshape(pool_k.shape)
    pool_v = pool_v.reshape(kv_shape).at[flat].set(
        v_new[:, :, 0, :].astype(pool_v.dtype),
        mode="drop").reshape(pool_v.shape)
    return pool_k, pool_v


def paged_prefill_update(
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_tables: jnp.ndarray,
    lens: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Context-phase bulk write: scatter a whole prompt's K/V through the
    block tables in one op (the gptAttention plugin's context-phase paged
    cache population, reference: docs/gpt_attention.md paged KV + context
    phase; the reference does it inside the fused kernel, here it is one
    XLA scatter over a flat (num_blocks*tpb) view of the pool).

    k/v: (B, H, S, dh) right-padded; lens: (B,) valid lengths. Padding
    positions and positions whose table entry is -1 are routed to an
    out-of-range flat index and dropped by the scatter (mode='drop'), so
    they can never corrupt other sequences' blocks."""
    n, tpb, h, dh = pool_k.shape
    b, _, s, _ = k.shape
    t = jnp.arange(s, dtype=jnp.int32)[None, :]                    # (1,S)
    blocks = jnp.take_along_axis(
        block_tables, t // tpb, axis=1)                            # (B,S)
    flat = blocks * tpb + t % tpb                                  # (B,S)
    valid = (t < lens[:, None]) & (blocks >= 0)
    flat = jnp.where(valid, flat, n * tpb)                         # OOB→drop
    # (B,S,H,dh) token-major values to match the pool's (token, H, dh) rows
    kv_shape = (n * tpb, h, dh)
    pool_k = pool_k.reshape(kv_shape).at[flat].set(
        k.transpose(0, 2, 1, 3).astype(pool_k.dtype),
        mode="drop").reshape(pool_k.shape)
    pool_v = pool_v.reshape(kv_shape).at[flat].set(
        v.transpose(0, 2, 1, 3).astype(pool_v.dtype),
        mode="drop").reshape(pool_v.shape)
    return pool_k, pool_v


def paged_mha_decode_step(
    q: jnp.ndarray,
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    block_tables: jnp.ndarray,
    valid_len: jnp.ndarray,
    fp32_softmax: bool = True,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-token attention against a paged cache: gather each lane's
    blocks into a (B, S, H, dh) window (S = max_blocks_per_seq ×
    tokens_per_block), then mask-attend exactly like mha_decode_step. The
    analog of the gptAttention/ibGptAttention paged-KV generation phase
    (reference: docs/gpt_attention.md paged KV cache section) — pointer
    chasing becomes one XLA gather over the block axis.

    q: (B, H, 1, dh); block_tables: (B, M) int32, -1 pads allowed (they are
    clipped for the gather and masked by ``valid_len``); valid_len: scalar
    or per-lane (B,) count of valid tokens."""
    n, tpb, h, dh = pool_k.shape
    b, m = block_tables.shape
    safe = jnp.clip(block_tables, 0, n - 1)
    k = jnp.reshape(pool_k[safe], (b, m * tpb, h, dh))
    v = jnp.reshape(pool_v[safe], (b, m * tpb, h, dh))
    scores = jnp.einsum(
        "bhqd,bthd->bhqt", q, k.astype(q.dtype),
        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    pos_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, m * tpb), 3)
    per_lane = getattr(valid_len, "ndim", 0) == 1
    vl = valid_len[:, None, None, None] if per_lane else valid_len
    scores = jnp.where(pos_ids < vl, scores, jnp.float32(-1e9))
    if fp32_softmax:
        weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    else:
        weights = jax.nn.softmax(scores.astype(q.dtype), axis=-1)
    return jnp.einsum(
        "bhqt,bthd->bhqd", weights, v.astype(q.dtype),
        preferred_element_type=q.dtype)
