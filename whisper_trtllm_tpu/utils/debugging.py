"""Debug support: per-layer intermediate capture + checked execution.

Analog of the reference's debugging machinery — mark-any-tensor-as-output,
Session._debug_run materializing all outputs, GenerationSession(debug_mode=)
(reference: tensorrt_llm/runtime/session.py:180-207, runtime/generation.py:155,
docs/2023-05-19-how-to-debug.md, tests/test_session.py:35-38) and the graph
``assertion`` op (reference: tensorrt_llm/functional.py:3095). The reference
needed these because a TRT fusion once miscompiled a cache unless it was
pinned as an output (README.md:100-106); the JAX equivalents are capturing
scan ys and jax.experimental.checkify.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.models.whisper import model as wmodel


def encode_with_intermediates(
    params: dict, cfg: WhisperConfig, mel: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Like models.whisper.encode but also returns each layer's output
    (L, B, S, d) — the per-module differential-debugging hook the reference
    gets by marking tensors as engine outputs."""
    enc = params["encoder"]
    x = jax.nn.gelu(
        wmodel.conv1d(enc["conv1"], mel, stride=1, padding=1), approximate=False
    )
    x = jax.nn.gelu(
        wmodel.conv1d(enc["conv2"], x, stride=2, padding=1), approximate=False
    )
    conv_out = x
    x = x + enc["embed_positions"].astype(x.dtype)[None]
    heads = cfg.encoder_attention_heads

    def body(carry, lp):
        out = wmodel._encoder_layer(lp, carry, heads)
        return out, out

    x, layer_outs = jax.lax.scan(body, x, enc["layers"])
    final = wmodel.layer_norm(enc["layer_norm"], x)
    return final, {"conv_stem": conv_out, "layer_outputs": layer_outs}


def checked(fn):
    """Wrap a jittable fn with checkify so jnp checks (NaN, OOB) surface as
    Python errors instead of silent garbage (the graph-assert analog)."""
    from jax.experimental import checkify

    cfn = checkify.checkify(fn, errors=checkify.user_checks | checkify.nan_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
