"""Weight-only int8 quantization.

Analog of the reference's weight-only path (reference:
tensorrt_llm/quantization/layer.py WeightOnly* +
cpp/tensorrt_llm/plugins/weightOnlyQuantMatmulPlugin/ +
tensorrt_llm/models/quantized/quant.py:51 weight_only_quantize): kernels are
stored int8 with per-output-channel symmetric scales; the matmul upcasts the
int8 weights to the activation dtype on the fly (HBM traffic halves — the
decode loop is weight-bandwidth-bound, so this is a direct speedup), no
custom kernel needed: XLA fuses convert+dot onto the MXU.

``ops.functional.dense`` dispatches on the presence of ``kernel_q``, so
quantized trees drop into every model unchanged.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) fp → (int8 kernel, (out,) fp32 per-channel scales)."""
    kernel = np.asarray(kernel, np.float32)
    amax = np.maximum(np.abs(kernel).max(axis=0), 1e-8)  # per output channel
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(kernel / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def dequantize_kernel(kernel_q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    return kernel_q.astype(dtype) * scale.astype(dtype)[None, :]


def quantize_dense_params(p: dict) -> dict:
    """{'kernel', 'bias'?} → {'kernel_q', 'scale', 'bias'?}. Leaves non-2D
    kernels (convs, stacked 3D layer kernels handled per-layer below)."""
    kernel = np.asarray(p["kernel"])
    if kernel.ndim == 2:
        q, s = quantize_kernel(kernel)
    elif kernel.ndim == 3:  # stacked (L, in, out): quantize each layer
        qs, ss = zip(*(quantize_kernel(k) for k in kernel))
        q, s = np.stack(qs), np.stack(ss)
    else:
        return dict(p)
    out = {"kernel_q": q, "scale": s}
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


_DENSE_KEYS = frozenset({
    "q", "k", "v", "out", "qkv", "fc1", "fc2",    # whisper layers
    "attn_qkv", "attn_out", "fc_in", "fc_out",    # gpt/bert layers
    "o", "gate", "up", "down",                    # llama layers
    "pooler",
})


def weight_only_quantize(params: dict, keys: Iterable[str] = _DENSE_KEYS) -> dict:
    """Rewrite a model tree, quantizing every dense-projection subtree whose
    dict key is in ``keys`` (analog of reference:
    tensorrt_llm/models/quantized/quant.py:51)."""
    keys = frozenset(keys)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if (
                name in keys
                and isinstance(sub, dict)
                and "kernel" in sub
                and np.asarray(sub["kernel"]).ndim in (2, 3)
            ):
                out[name] = quantize_dense_params(sub)
            else:
                out[name] = walk(sub)
        return out

    return walk(params)


def quantize_kernel_int4(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) fp → (packed int4 kernel (in, out//2) int8, (out,) scales).
    Two nibbles per byte along the output dim; symmetric per-channel scales
    (analog of the reference's int4 weight-only path,
    cpp/tensorrt_llm/plugins/weightOnlyQuantMatmulPlugin int4 mode)."""
    kernel = np.asarray(kernel, np.float32)
    assert kernel.shape[1] % 2 == 0, "output dim must be even to pack int4"
    amax = np.maximum(np.abs(kernel).max(axis=0), 1e-8)
    scale = (amax / 7.0).astype(np.float32)
    q = np.clip(np.round(kernel / scale[None, :]), -8, 7).astype(np.int8)
    low = q[:, 0::2] & 0x0F
    high = (q[:, 1::2] & 0x0F) << 4
    return (low | high).astype(np.int8), scale


def unpack_int4_kernel(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(in, out//2) int8 → (in, out) in ``dtype`` (unscaled nibble values).
    Sign extension via shift-left-then-arithmetic-shift-right."""
    p = packed.astype(jnp.int8)
    low = jnp.right_shift(jnp.left_shift(p, 4), 4)         # sign-extended
    high = jnp.right_shift(p, 4)                           # arithmetic shift
    inter = jnp.stack([low, high], axis=-1)                # (..., out//2, 2)
    return inter.reshape(p.shape[:-1] + (-1,)).astype(dtype)


def quantize_dense_params_int4(p: dict) -> dict:
    kernel = np.asarray(p["kernel"])
    if kernel.ndim == 2:
        q, s = quantize_kernel_int4(kernel)
    elif kernel.ndim == 3:
        qs, ss = zip(*(quantize_kernel_int4(k) for k in kernel))
        q, s = np.stack(qs), np.stack(ss)
    else:
        return dict(p)
    out = {"kernel_q4": q, "scale": s}
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def weight_only_quantize_int4(params: dict,
                              keys: Iterable[str] = _DENSE_KEYS) -> dict:
    """int4 variant of weight_only_quantize (QuantMode.INT4_WEIGHTS)."""
    keys = frozenset(keys)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if (
                name in keys
                and isinstance(sub, dict)
                and "kernel" in sub
                and np.asarray(sub["kernel"]).ndim in (2, 3)
                and np.asarray(sub["kernel"]).shape[-1] % 2 == 0
            ):
                out[name] = quantize_dense_params_int4(sub)
            else:
                out[name] = walk(sub)
        return out

    return walk(params)


def quantize_kernel_fp8(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) fp → (float8_e4m3fn kernel, () fp32 per-tensor scale).

    The reference's FP8 path is per-tensor-scaled QDQ on weight and
    activation with calibrated scaling factors (reference:
    tensorrt_llm/quantization/layer.py:442-560 FP8Linear/FP8RowLinear,
    QuantMode.FP8_QDQ). Weights here are stored genuinely fp8 (half the
    HBM traffic of bf16); e4m3fn max-finite is 448, so amax/448 keeps the
    cast saturation-free."""
    kernel = np.asarray(kernel, np.float32)
    amax = max(float(np.abs(kernel).max()), 1e-8)
    scale = np.float32(amax / 448.0)
    q = (kernel / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def fp8_qdq_activation(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-tensor activation QDQ through float8_e4m3fn (the
    reference calibrates activation_scaling_factor offline; TPU has no
    TensorRT calibration cache, so the scale is the runtime abs-max —
    strictly tighter than a calibrated bound)."""
    amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8)
    scale = amax / 448.0
    q = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return (q.astype(jnp.float32) * scale).astype(x.dtype)


def quantize_dense_params_fp8(p: dict) -> dict:
    kernel = np.asarray(p["kernel"])
    if kernel.ndim == 2:
        q, s = quantize_kernel_fp8(kernel)
    elif kernel.ndim == 3:
        qs, ss = zip(*(quantize_kernel_fp8(k) for k in kernel))
        q, s = np.stack(qs), np.stack(ss)
    else:
        return dict(p)
    out = {"kernel_f8": np.asarray(q), "scale": np.asarray(s, np.float32)}
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def fp8_quantize(params: dict, keys: Iterable[str] = _DENSE_KEYS) -> dict:
    """QuantMode.FP8_QDQ tree rewrite (the fp8 analog of
    weight_only_quantize; reference: models/quantized/quant.py rewriters)."""
    keys = frozenset(keys)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if (
                name in keys
                and isinstance(sub, dict)
                and "kernel" in sub
                and np.asarray(sub["kernel"]).ndim in (2, 3)
            ):
                out[name] = quantize_dense_params_fp8(sub)
            else:
                out[name] = walk(sub)
        return out

    return walk(params)


def quantize_embedding(table: np.ndarray) -> dict:
    """(V, d) fp → {"table_q" int8, "scale" (V,) fp32}, symmetric per row.

    Targets the tied vocab head: the logits einsum contracts over d, so the
    per-row scale factors out of the dot entirely — HBM reads the table
    int8 (the decode loop's single largest weight read: 40 MB bf16 at
    tiny.en, 106 MB at medium.en) and the MXU sees an int8->bf16 upcast
    fused into the matmul, same as weight-only dense."""
    table = np.asarray(table, np.float32)
    amax = np.maximum(np.abs(table).max(axis=1), 1e-8)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(table / scale[:, None]), -127, 127).astype(np.int8)
    return {"table_q": q, "scale": scale}


def quantize_vocab_embedding(params: dict) -> dict:
    """Whisper-tree rewrite: decoder.embed_tokens → int8 dict (embedding
    lookups dequantize per gathered row; the vocab-head einsum applies the
    scales after the dot)."""
    dec = dict(params["decoder"])
    dec["embed_tokens"] = quantize_embedding(dec["embed_tokens"])
    return {**params, "decoder": dec}
