"""The functional op core: pure jnp functions over parameter pytrees.

Analog of the reference's graph-functional layer
(reference: tensorrt_llm/functional.py — ~70 free functions that each append a
TRT network node). On TPU there is no graph DSL to maintain: JAX *is* the
tracer, so these are ordinary functions that XLA fuses; the module/network/
builder machinery (reference: tensorrt_llm/module.py, network.py, builder.py)
collapses into jit + pytrees (SURVEY.md §7 design inversion 1).

Parameter convention: dicts with ``kernel`` of shape (in, out) and optional
``bias`` of shape (out,) — transposed from torch at conversion time so every
matmul is a plain row-major MXU dot.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — Whisper uses torch.nn.functional.gelu default
    (reference: tensorrt_llm/functional.py gelu + ACT2FN table :3383)."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ kernel + bias. kernel: (in, out).

    Analog of Linear/ColumnLinear/RowLinear minus the TP collectives
    (reference: tensorrt_llm/layers/linear.py:38-139) — on TPU the collective
    is inserted by XLA from the sharding of ``kernel``, not hand-written.

    Weight-only int8 trees (quantization.weight_only_quantize) carry
    ``kernel_q`` + per-channel ``scale`` instead of ``kernel``; the upcast
    fuses into the dot (analog of weightOnlyQuantMatmulPlugin, reference:
    cpp/tensorrt_llm/plugins/weightOnlyQuantMatmulPlugin/).
    """
    if "kernel_sq" in params:
        # SmoothQuant: activations smoothed per input channel, then int8
        # per-token dynamic quant; int8 x int8 dot with int32 accumulation
        # runs on the MXU at double int8 throughput (analog of
        # smoothQuantGemmPlugin + per-token quantize kernels, reference:
        # cpp/tensorrt_llm/plugins/smoothQuantGemmPlugin/,
        # tensorrt_llm/quantization/functional.py quantize_per_token).
        xs = x * params["smooth"].astype(x.dtype)
        amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
        act_scale = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
        xq = jnp.clip(
            jnp.round(xs.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)
        yi = jax.lax.dot_general(
            xq, params["kernel_sq"],
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (yi.astype(jnp.float32) * act_scale
             * params["scale"].astype(jnp.float32)).astype(x.dtype)
    elif "kernel_q" in params:
        w = params["kernel_q"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
        y = y * params["scale"].astype(y.dtype)
    elif "kernel_q4" in params:
        from whisper_trtllm_tpu.quantization.quantize import unpack_int4_kernel

        w = unpack_int4_kernel(params["kernel_q4"], x.dtype)
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
        y = y * params["scale"].astype(y.dtype)
    elif "kernel_f8" in params:
        # FP8 QDQ: fp8-stored weight (per-tensor scale) x fp8-QDQ'd
        # activation, accumulated in the compute dtype (analog of
        # FP8Linear/FP8RowLinear, reference:
        # tensorrt_llm/quantization/layer.py:442-560; the quantize/dequantize
        # pairs become convert ops XLA fuses into the dot)
        from whisper_trtllm_tpu.quantization.quantize import fp8_qdq_activation

        xq = fp8_qdq_activation(x)
        w = params["kernel_f8"].astype(x.dtype)
        y = jnp.dot(xq, w, preferred_element_type=x.dtype)
        y = y * params["scale"].astype(y.dtype)
    else:
        y = jnp.dot(x, params["kernel"], preferred_element_type=x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics regardless of compute dtype
    (analog of layernormPlugin, reference:
    cpp/tensorrt_llm/plugins/layernormPlugin/layernormPlugin.cpp — XLA fuses
    this chain; a Pallas variant lives in ops/pallas/layer_norm.py)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(params: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm (reference: tensorrt_llm/functional.py:3195) — used by the
    LLaMA-family zoo models, not Whisper."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    return y.astype(dtype)


def embedding(table, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Token embedding gather (analog of lookupPlugin, reference:
    cpp/tensorrt_llm/plugins/lookupPlugin/lookupPlugin.cpp) — with a sharded
    table XLA lowers this to a distributed gather, no plugin needed.

    ``table`` may be an int8-quantized dict {"table_q", "scale"} from
    quantization.quantize_embedding — gathered rows dequantize on the fly."""
    if isinstance(table, dict):
        rows = jnp.take(table["table_q"], ids, axis=0)
        scale = jnp.take(table["scale"], ids, axis=0)[..., None]
        out = rows.astype(scale.dtype) * scale
    else:
        out = jnp.take(table, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out


def softmax_fp32(scores: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Softmax computed in fp32 — mirrors the reference's forced-fp32
    attention core (reference: tensorrt_llm/models/whisper/model.py:292-295)."""
    out = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return out.astype(dtype or scores.dtype)


def sinusoid_position_embedding(length: int, channels: int) -> np.ndarray:
    """Whisper encoder sinusoids: first half sin, second half cos, with
    log-timescale increment ln(10000)/(channels//2 - 1). Matches the constant
    weight the reference binds at build time
    (reference: examples/whisper/build_encoder.py:74 /
    tensorrt_llm/models/whisper/model.py:92-95)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def conv1d(
    params: dict, x: jnp.ndarray, stride: int = 1, padding: int = 1
) -> jnp.ndarray:
    """1-D convolution over time-major input (B, T, C_in) with kernel
    (K, C_in, C_out).

    A real conv1d — the reference had to emulate it with Conv2d because
    TRT-LLM lacked one (reference: tensorrt_llm/models/whisper/model.py:77-79,
    96-100); XLA lowers this straight onto the MXU.
    """
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


def alibi_bias(num_heads: int, seq_len: int) -> jnp.ndarray:
    """ALiBi attention bias (1, H, 1, S) — additive, broadcast over query
    positions (analog of reference: tensorrt_llm/functional.py:3222-3283
    generate_alibi_slopes/generate_alibi_biases, used by the Bloom family).
    Slopes follow the ALiBi paper: geometric sequence based on the closest
    power of two ≤ num_heads, with interpolated extra slopes."""
    import math as _math

    closest = 2 ** _math.floor(_math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(_math.log2(closest) - 3.0)))
    slopes = [base ** (i + 1) for i in range(closest)]
    if closest < num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(_math.log2(2 * closest) - 3.0)))
        n_extra = num_heads - closest
        slopes += [extra_base ** (2 * i + 1) for i in range(n_extra)]
    slopes_arr = jnp.asarray(slopes, jnp.float32)          # (H,)
    positions = jnp.arange(seq_len, dtype=jnp.float32)     # (S,)
    return (slopes_arr[:, None] * positions[None, :])[None, :, None, :]


def gather_last_token_logits(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Gather each row's last *valid* position from a right-padded batch:
    x (B, S, ...) + lengths (B,) → (B, ...) at index lengths-1 per row
    (analog of reference: tensorrt_llm/functional.py:3316
    gather_last_token_logits, the ragged-batch context-phase logits gather)."""
    idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, x.shape[1] - 1)
    idx = idx.reshape((idx.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.take_along_axis(x, idx, axis=1).squeeze(1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation (reference: tensorrt_llm/layers/activation.py Mish)."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACT2FN["mish"] = mish
ACT2FN["gelu_pytorch_tanh"] = ACT2FN["gelu_new"]


def group_norm(
    params: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-5
) -> jnp.ndarray:
    """GroupNorm over (B, *spatial, C) activations — statistics per
    (batch, group) across the group's channels AND all spatial positions,
    matching torch.nn.GroupNorm (reference: tensorrt_llm/functional.py
    group_norm — used by the UNet family). fp32 statistics."""
    dtype = x.dtype
    b, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    y = y * params["scale"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def prompt_tuning_embedding(
    table: jnp.ndarray,
    prompt_table: jnp.ndarray,
    ids: jnp.ndarray,
    tasks: jnp.ndarray = None,
    dtype=None,
) -> jnp.ndarray:
    """Embedding lookup with prompt-tuning slots: ids >= vocab_size index
    into ``prompt_table`` (a learned virtual-token table) instead of the
    vocabulary (analog of reference:
    tensorrt_llm/layers/embedding.py:33-80 PromptTuningEmbedding).

    With ``tasks`` (B,) given, ``prompt_table`` is per-task pages
    (num_tasks, task_vocab, d) and id - vocab_size indexes the row's task
    page — the reference's multi-task serving inputs
    prompt_embedding_table/tasks/prompt_vocab_size (reference:
    tensorrt_llm/runtime/generation.py:501-524). The reference flattens the
    pages into one buffer and offsets ids by tasks * task_vocab_size; a 3-D
    table with a two-level gather is the same lookup without the offset
    arithmetic. Without ``tasks``, ``prompt_table`` is a single (P, d)
    table shared by the whole batch."""
    vocab = table.shape[0]
    is_prompt = ids >= vocab
    tok = jnp.take(table, jnp.where(is_prompt, 0, ids), axis=0)
    if tasks is None:
        vt = jnp.take(
            prompt_table,
            jnp.clip(ids - vocab, 0, prompt_table.shape[0] - 1), axis=0)
    else:
        virt = jnp.clip(ids - vocab, 0, prompt_table.shape[1] - 1)
        pages = jnp.take(prompt_table, tasks, axis=0)  # (B, task_vocab, d)
        vt = jnp.take_along_axis(pages, virt[:, :, None], axis=1)
    out = jnp.where(is_prompt[..., None], vt.astype(tok.dtype), tok)
    return out.astype(dtype) if dtype is not None else out


def conv2d(
    params: dict, x: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """2-D convolution over channels-last input (B, H, W, C_in) with kernel
    (KH, KW, C_in, C_out) — the TPU-native layout (channels ride the
    128-lane dim; analog of reference: tensorrt_llm/functional.py:2203
    conv2d, which is NCHW for TRT). Used by the UNet family."""
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsampling of (B, H, W, C) (analog of
    reference: tensorrt_llm/functional.py interpolate(scale_factor=2,
    mode='nearest'), used by the UNet Upsample2D)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool of (B, H, W, C) (analog of reference:
    tensorrt_llm/functional.py:2169 avg_pool2d)."""
    s = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return s / 4.0
