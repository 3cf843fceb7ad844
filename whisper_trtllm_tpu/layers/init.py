"""Parameter constructors for the layer library.

Analog of the reference's layer classes' weight declarations
(reference: tensorrt_llm/layers/linear.py, normalization.py, embedding.py,
conv.py, attention.py:48-130 and tensorrt_llm/parameter.py:11-59). Parameters
here are plain arrays in nested dicts; initialization mirrors HF Whisper
(normal std=0.02, zeros bias) so random-init parity tests against HF torch
models are meaningful.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_dense(rng: np.random.Generator, d_in: int, d_out: int, bias: bool = True,
               std: float = 0.02) -> dict:
    p = {"kernel": rng.normal(0.0, std, (d_in, d_out)).astype(np.float32)}
    if bias:
        p["bias"] = np.zeros((d_out,), np.float32)
    return p


def init_layer_norm(d: int) -> dict:
    return {"scale": np.ones((d,), np.float32), "bias": np.zeros((d,), np.float32)}


def init_embedding(rng: np.random.Generator, vocab: int, d: int,
                   std: float = 0.02) -> np.ndarray:
    return rng.normal(0.0, std, (vocab, d)).astype(np.float32)


def init_conv1d(rng: np.random.Generator, k: int, c_in: int, c_out: int,
                std: float = 0.02) -> dict:
    return {
        "kernel": rng.normal(0.0, std, (k, c_in, c_out)).astype(np.float32),
        "bias": np.zeros((c_out,), np.float32),
    }


def init_attention(rng: np.random.Generator, d: int, std: float = 0.02) -> dict:
    """q/k/v/out projections; k is bias-free, matching Whisper (reference:
    tensorrt_llm/models/whisper/model.py:215-238 — separate q/k/v with
    zero-filled k bias in the fused build,
    examples/whisper/build_encoder.py:79-86)."""
    return {
        "q": init_dense(rng, d, d, bias=True, std=std),
        "k": init_dense(rng, d, d, bias=False, std=std),
        "v": init_dense(rng, d, d, bias=True, std=std),
        "out": init_dense(rng, d, d, bias=True, std=std),
    }
