"""Single-token masked attention against a static KV cache (generation hot op).

Replaces the reference's decoderMaskedMultiheadAttention CUDA kernels and the
4-mode WhisperDecoderAttention plugin matrix (reference:
cpp/tensorrt_llm/kernels/decoderMaskedMultiheadAttention*,
tensorrt_llm/models/whisper/model.py:153-304): one shape-static kernel where
the number of valid cache positions is a runtime scalar (SMEM-prefetched),
serving self-attention (valid_len = pos+1) and cross-attention
(valid_len = encoder length) alike.

Layout: one program per (batch, head); scores as a (T, 1) column so the
q·K^T contraction is an MXU (T, dh) x (dh, 1) matvec and the softmax is a
sublane reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    valid_len = len_ref[0]
    q = q_ref[0]                        # (1, dh)
    k = k_ref[0]                        # (T, dh)
    v = v_ref[0]
    s = jax.lax.dot_general(
        k, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                   # (T, 1) fp32
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row < valid_len, s, jnp.float32(-1e9))
    m = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(v.dtype)  # (T, 1)
    # Mosaic requires a 32-bit matmul accumulator (bf16 acc is rejected)
    o_ref[0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)                   # (1, dh)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_mha(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    valid_len: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H, 1, dh) pre-scaled; cache: (B, H, T, dh); valid_len: scalar
    int32. Returns (B, H, 1, dh)."""
    b, h, _, dh = q.shape
    t = cache_k.shape[2]
    qs = q.reshape(b * h, 1, dh)
    ks = cache_k.reshape(b * h, t, dh)
    vs = cache_v.reshape(b * h, t, dh)
    vl = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, 1, dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vl, qs, ks, vs)
    return out.reshape(b, h, 1, dh)
