"""Fused cross-attention decode kernel with head-contiguous KV layout.

Motivated by an xprof trace of the decode loop (docs/PERFORMANCE.md): the two
cross-attention dots are 53% of device time and run at ~26% of HBM bandwidth
under the (B, H, T, dh) layout — dh=64 fills only half a (8,128) lane tile
and each (1, dh) x (dh, T) matvec is a degenerate MXU shape. This kernel
stores cross-KV as (B, T, H*dh) so every HBM read is a full-width tile
(H*dh = 384..1280 lanes), loads K and V once into VMEM per utterance, and
walks the heads as VMEM-resident (T, dh) x (dh, 1) dots.

One program per batch element; valid_len is static (the encoder length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, head_dim: int,
            valid_len: int):
    k = k_ref[0]                                    # (T, H*dh)
    v = v_ref[0]
    t = k.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    pad_mask = row < valid_len
    q = q_ref[0]                                    # (H*dh,)
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[sl][None, :]                         # (1, dh)
        s = jax.lax.dot_general(
            k[:, sl], qh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (T, 1) fp32
        s = jnp.where(pad_mask, s, jnp.float32(-1e9))
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v[:, sl],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype))                          # (1, dh)
    o_ref[0] = jnp.concatenate(outs, axis=1)[0]     # (H*dh,)


@functools.partial(
    jax.jit, static_argnames=("heads", "head_dim", "valid_len", "interpret")
)
def cross_decode_mha(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    heads: int,
    head_dim: int,
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H*dh) pre-scaled; cache_k/v: (B, T, H*dh); returns (B, H*dh)."""
    b, hd = q.shape
    t = cache_k.shape[1]
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, head_dim=head_dim,
                          valid_len=valid_len),
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, cache_k, cache_v)
    return out
