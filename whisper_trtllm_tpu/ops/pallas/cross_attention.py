"""Cross-attention decode kernel with head-contiguous KV layout (library
kernel, NOT wired into the decode path).

Hypothesis tested: storing cross-KV as (B, T, H*dh) makes every HBM read a
full-width lane tile (H*dh = 384..1280 lanes) instead of dh=64 half-tiles,
so the per-step cross-attention matvecs should run closer to HBM roofline
than the (B, H, T, dh) XLA path.

Measured on v5e (bf16, T=1504, chained 100x inside one jit —
/tmp/bench_cross protocol, 2026-08-17): tiny dims (H6·dh64) b8
XLA 273 us vs this kernel 307 us; b16 374 vs 367 (parity); medium dims
(H16·dh64) exceed the 16 MB scoped-VMEM limit with whole-utterance K/V
blocks. Verdict: XLA's layout assignment already handles the decode-step
matvecs well — same conclusion as the Pallas decode-attention kernel
(docs/PERFORMANCE.md), so this stays a library kernel for future tiling
experiments and is not dispatched by the models.

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
    q = q_ref[0, 0]                                 # (H*dh,)
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[sl][None, :].astype(jnp.float32)     # (1, dh)
        # fp32 operands: Mosaic mis-lowers bf16 dots with a (1, dh)
        # broadcast operand ('vector.broadcast' element-type mismatch).
        # HIGHEST precision: default-precision MXU rounds fp32 operands to
        # one bf16 pass (measured 3.2e-4 max err vs the XLA oracle on v5e —
        # the same drift the STFT kernel hit); full fp32 passes restore
        # <2e-4 agreement.
        s = jax.lax.dot_general(
            k[:, sl].astype(jnp.float32), qh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # (T, 1) fp32
        s = jnp.where(pad_mask, s, jnp.float32(-1e9))
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        outs.append(jax.lax.dot_general(
            p, v[:, sl].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(v.dtype))                          # (1, dh)
    o_ref[0, 0] = jnp.concatenate(outs, axis=1)[0]  # (H*dh,)


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
    # q/out ride as (B, 1, H*dh) — a (1, 1, hd) block's trailing dims equal
    # the array's, which Mosaic accepts where (1, hd) 2-D blocks are rejected
    # (sublane dim must be a multiple of 8 or the full axis).
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, head_dim=head_dim,
                          valid_len=valid_len),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q[:, None], cache_k, cache_v)
    return out[:, 0]
