"""Fused bidirectional multi-head attention (encoder self-attention).

Replaces the reference's bertAttentionPlugin / FMHA-v2 cubins
(reference: cpp/tensorrt_llm/plugins/bertAttentionPlugin/
bertAttentionPlugin.cpp, cpp/tensorrt_llm/kernels/
contextFusedMultiHeadAttention/). The (S, T) score matrix lives only in
VMEM per (batch, head, q-block) program — never materialized in HBM, which
is the XLA fallback's main memory cost at S=1500.

Whisper encoder K/V for one head (1536x64 fp32 ≈ 0.4 MB) fit comfortably in
VMEM, so each program loads full K/V and does one exact fp32 softmax — no
online-softmax recurrence needed at these sequence lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128  # q-block rows


def _mask_scores(s, valid_len: int, causal: bool):
    """Padding mask (static valid_len) + optional causal mask. The q-block's
    absolute row offset is program_id(2) * BQ — the context-FMHA causal
    variant (reference: cpp/tensorrt_llm/kernels/
    contextFusedMultiHeadAttention/ causal_mask kernels)."""
    t = s.shape[1]
    if valid_len < t:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, jnp.float32(-1e9))
    if causal:
        row = pl.program_id(2) * BQ + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, jnp.float32(-1e9))
    return s


def _kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float,
            causal: bool = False):
    q = q_ref[0, 0]                    # (BQ, dh)
    k = k_ref[0, 0]                    # (T, dh)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (BQ, T) fp32
    s = _mask_scores(s, valid_len, causal)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    # Mosaic requires a 32-bit matmul accumulator (bf16 acc is rejected)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_impl(q, k, v, interpret, causal=False):
    b, h, s, dh = q.shape
    t = k.shape[2]
    # grouped-query attention: q-head j reads kv-head j // group via the
    # BlockSpec index map — no repeated K/V ever materializes (the
    # reference's MQA/GQA flag, tensorrt_llm/layers/attention.py:72)
    group = h // k.shape[1]
    qp = _pad_to(q, 2, BQ)
    kp = _pad_to(k, 2, 8)
    vp = _pad_to(v, 2, 8)
    sp, tp = qp.shape[2], kp.shape[2]

    grid = (b, h, sp // BQ)
    kv_spec = pl.BlockSpec((1, 1, tp, dh),
                           lambda i, j, n: (i, j // group, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, valid_len=t, scale=1.0, causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BQ, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, dh), lambda i, j, n: (i, j, n, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :s]


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                valid_len: int, scale: float, causal: bool = False,
                group: int = 1):
    """Backward pass, one program per (batch, head, q-block). Recomputes the
    block's exact softmax from q/k (cheaper than spilling the (S, T) score
    matrix to HBM — the same rationale flash backward uses), emits the
    q-block's dq, and accumulates dk/dv into fp32 output blocks revisited
    across the q-block grid axis."""
    n = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)        # (BQ, dh)
    k = k_ref[0, 0].astype(jnp.float32)        # (T, dh)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)      # (BQ, dh)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # (BQ, T)
    s = _mask_scores(s, valid_len, causal)
    p = jax.nn.softmax(s, axis=-1)             # (BQ, T) fp32
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (BQ, T)
    delta = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = p * (dp - delta) * scale              # (BQ, T)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_c = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (T, dh)
    dv_c = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dk/dv accumulate across q-blocks AND across the q-heads sharing this
    # kv head (GQA): the kv output block's index is (i, j // group), so it
    # stays resident while (j within the group, n) iterate — initialize on
    # the first visit only
    j = pl.program_id(1)
    first_visit = jnp.logical_and(n == 0, j % group == 0)

    @pl.when(first_visit)
    def _():
        dk_ref[0, 0] = dk_c
        dv_ref[0, 0] = dv_c

    @pl.when(jnp.logical_not(first_visit))
    def _():
        dk_ref[0, 0] += dk_c
        dv_ref[0, 0] += dv_c


def _bwd_impl(q, k, v, do, interpret, causal=False):
    b, h, s, dh = q.shape
    hkv = k.shape[1]
    group = h // hkv
    t = k.shape[2]
    qp = _pad_to(q, 2, BQ)
    dop = _pad_to(do, 2, BQ)
    kp = _pad_to(k, 2, 8)
    vp = _pad_to(v, 2, 8)
    sp, tp = qp.shape[2], kp.shape[2]

    grid = (b, h, sp // BQ)
    blk_q = pl.BlockSpec((1, 1, BQ, dh), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, 1, tp, dh),
                          lambda i, j, n: (i, j // group, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, valid_len=t, scale=1.0, causal=causal,
                          group=group),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sp, dh), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, tp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, tp, dh), jnp.float32),
        ],
        grid=grid,
        in_specs=[blk_q, blk_kv, blk_kv, blk_q],
        out_specs=[blk_q, blk_kv, blk_kv],
        interpret=interpret,
    )(qp, kp, vp, dop)
    return (
        dq[:, :, :s],
        dk[:, :, :t].astype(k.dtype),
        dv[:, :, :t].astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, interpret, causal):
    return _fwd_impl(q, k, v, interpret, causal)


def _flash_fwd(q, k, v, interpret, causal):
    return _fwd_impl(q, k, v, interpret, causal), (q, k, v)


def _flash_bwd(interpret, causal, res, do):
    q, k, v = res
    return _bwd_impl(q, k, v, do, interpret, causal)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "causal"))
def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention. q: (B, H, S, dh), k/v: (B, H, T, dh); q is
    expected pre-scaled (Whisper convention) — no extra scaling applied.
    Returns (B, H, S, dh). ``causal=True`` masks col > row (requires
    S == T: the context-phase square case, ≙ the reference's causal
    context FMHA). K/V may carry fewer heads (MQA/GQA, Hkv | H): q-head j
    reads kv-head j // (H/Hkv) straight from the block index map — the
    repeated-K/V tensor never exists. Differentiable either way: a custom
    VJP runs the fused backward kernel (`_bwd_kernel`), so the training
    path may keep the kernel enabled."""
    if causal:
        assert q.shape[2] == k.shape[2], "causal flash requires S == T"
    assert q.shape[1] % k.shape[1] == 0, "H must be a multiple of Hkv"
    return _flash(q, k, v, interpret, causal)
