"""Reusable transformer building blocks (functional).

Analog of the reference's Attention / MLP layer classes
(reference: tensorrt_llm/layers/attention.py:48-357, layers/mlp.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from whisper_trtllm_tpu.ops.functional import ACT2FN, dense


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, S, d) → (B, H, S, dh)."""
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, dh) → (B, S, d)."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def attention_qkv(
    params: dict,
    x: jnp.ndarray,
    kv_states: Optional[jnp.ndarray],
    heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project q (scaled by dh**-0.5, Whisper convention) from ``x`` and k/v
    from ``kv_states`` (self-attention when None). Returns (B, H, S, dh).

    Trees transformed by ``models.whisper.fuse_qkv_params`` carry a single
    ``qkv`` projection (the reference's fused-QKV optimization,
    reference: tensorrt_llm/layers/attention.py:48 + the zero-filled k-bias
    trick of examples/whisper/build_encoder.py:79-86) — one matmul instead
    of three in the self-attention case."""
    d = x.shape[-1]
    scale = (d // heads) ** -0.5
    if "qkv" in params and kv_states is None:
        fused = dense(params["qkv"], x)                     # (B, S, 3d)
        q, k, v = jnp.split(fused, 3, axis=-1)
        return split_heads(q * scale, heads), split_heads(k, heads), \
            split_heads(v, heads)
    kv = x if kv_states is None else kv_states
    q = split_heads(dense(params["q"], x) * scale, heads)
    k = split_heads(dense(params["k"], kv), heads)
    v = split_heads(dense(params["v"], kv), heads)
    return q, k, v


def mlp_block(params: dict, x: jnp.ndarray, activation: str = "gelu") -> jnp.ndarray:
    """fc1 → act → fc2 (reference: tensorrt_llm/layers/mlp.py MLP)."""
    return dense(params["fc2"], ACT2FN[activation](dense(params["fc1"], x)))
