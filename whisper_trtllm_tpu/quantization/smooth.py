"""SmoothQuant int8 activation+weight quantization for the Whisper model.

Analog of the reference's smooth-quant path (reference:
tensorrt_llm/quantization/layer.py SmoothQuant* layer variants,
cpp/tensorrt_llm/plugins/smoothQuantGemmPlugin/,
tensorrt_llm/models/quantized/quant.py:8 smooth_quantize — which, like
this, is wired for one model family: GPT there, Whisper here).

SmoothQuant (Xiao et al.): activation outliers concentrate in a few
channels, so per-channel smoothing factors
``s_j = amax_act_j**alpha / amax_w_j**(1-alpha)`` migrate quantization
difficulty from activations into weights: ``y = (x / s) @ (diag(s) W)``.
Both factors are then int8-quantizable — activations with *per-token*
dynamic scales, weights per output channel — and the GEMM runs int8 x int8
with int32 accumulation on the MXU (``ops.functional.dense`` dispatches on
``kernel_sq``).

Calibration runs the teacher-forced forward once over a calibration batch
and records the abs-max of every dense input per layer; the scanned layer
stacks make these naturally (L, d_in)-shaped scan outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.layers.transformer import attention_qkv, merge_heads
from whisper_trtllm_tpu.models.whisper import model as wmodel
from whisper_trtllm_tpu.ops.attention import mha
from whisper_trtllm_tpu.ops.functional import ACT2FN, conv1d, dense, embedding, layer_norm


def _amax(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, d) → (d,) abs-max over batch and positions."""
    return jnp.max(jnp.abs(x), axis=(0, 1))


def _encoder_stats(params: dict, cfg: WhisperConfig, mel: jnp.ndarray):
    """Mirror of models.whisper.encode capturing each dense's input amax
    (same math — guarded by tests against the plain forward)."""
    enc = params["encoder"]
    x = jax.nn.gelu(conv1d(enc["conv1"], mel, stride=1, padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(enc["conv2"], x, stride=2, padding=1), approximate=False)
    x = x + enc["embed_positions"].astype(x.dtype)[None]
    heads = cfg.encoder_attention_heads

    def body(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k, v = attention_qkv(lp["self_attn"], h, None, heads)
        a = merge_heads(mha(q, k, v, causal=False))
        x = x + dense(lp["self_attn"]["out"], a)
        h2 = layer_norm(lp["final_layer_norm"], x)
        mid = ACT2FN["gelu"](dense(lp["fc1"], h2))
        x = x + dense(lp["fc2"], mid)
        stats = {
            "attn_in": _amax(h), "attn_out_in": _amax(a),
            "fc1_in": _amax(h2), "fc2_in": _amax(mid),
        }
        return x, stats

    x, stats = jax.lax.scan(body, x, enc["layers"])
    return layer_norm(enc["layer_norm"], x), stats


def _decoder_stats(params: dict, cfg: WhisperConfig, tokens: jnp.ndarray,
                   enc_states: jnp.ndarray):
    dec = params["decoder"]
    s = tokens.shape[1]
    x = embedding(dec["embed_tokens"], tokens, dtype=enc_states.dtype)
    x = x + dec["embed_positions"][:s].astype(x.dtype)[None]
    heads = cfg.decoder_attention_heads

    def body(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k, v = attention_qkv(lp["self_attn"], h, None, heads)
        a = merge_heads(mha(q, k, v, causal=True))
        x = x + dense(lp["self_attn"]["out"], a)
        hc = layer_norm(lp["encoder_attn_layer_norm"], x)
        q, k, v = attention_qkv(lp["encoder_attn"], hc, enc_states, heads)
        ac = merge_heads(mha(q, k, v, causal=False))
        x = x + dense(lp["encoder_attn"]["out"], ac)
        h2 = layer_norm(lp["final_layer_norm"], x)
        mid = ACT2FN["gelu"](dense(lp["fc1"], h2))
        x = x + dense(lp["fc2"], mid)
        stats = {
            "attn_in": _amax(h), "attn_out_in": _amax(a),
            "cross_in": _amax(hc), "cross_kv_in": _amax(enc_states),
            "cross_out_in": _amax(ac),
            "fc1_in": _amax(h2), "fc2_in": _amax(mid),
        }
        return x, stats

    _, stats = jax.lax.scan(body, x, dec["layers"])
    return stats


def whisper_act_stats(
    params: dict, cfg: WhisperConfig, mel: jnp.ndarray, tokens: jnp.ndarray
) -> dict:
    """Calibration pass: per-layer (L, d_in) abs-max of every dense input,
    for a calibration batch of mels (B, 3000, M) and teacher-forcing token
    prefixes (B, S)."""
    enc_states, enc_stats = _encoder_stats(params, cfg, mel)
    dec_stats = _decoder_stats(params, cfg, tokens, enc_states)
    return jax.tree_util.tree_map(
        np.asarray, {"encoder": enc_stats, "decoder": dec_stats}
    )


def _smooth_factors(w: np.ndarray, act_amax: np.ndarray,
                    alpha: float) -> np.ndarray:
    """w (d_in, d_out), act_amax (d_in,) → s (d_in,)."""
    w_amax = np.maximum(np.abs(w).max(axis=-1), 1e-8)
    s = np.power(np.maximum(act_amax, 1e-8), alpha) / np.power(w_amax, 1.0 - alpha)
    return np.clip(s, 1e-4, 1e4).astype(np.float32)


def _sq_dense(p: dict, act_amax_l: np.ndarray, alpha: float) -> dict:
    """Per-layer-stacked dense {kernel (L, din, dout)} + (L, din) stats →
    {kernel_sq int8, scale (L, dout), smooth (L, din), bias?}."""
    from whisper_trtllm_tpu.quantization.quantize import quantize_kernel

    kernel = np.asarray(p["kernel"], np.float32)
    qs, scales, smooths = [], [], []
    for li in range(kernel.shape[0]):
        s = _smooth_factors(kernel[li], act_amax_l[li], alpha)
        q, sc = quantize_kernel(kernel[li] * s[:, None])
        qs.append(q)
        scales.append(sc)
        smooths.append(1.0 / s)
    out = {
        "kernel_sq": np.stack(qs),
        "scale": np.stack(scales),
        "smooth": np.stack(smooths).astype(np.float32),
    }
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def gpt_act_stats(params: dict, cfg, tokens: jnp.ndarray) -> dict:
    """Calibration pass for the GPT family — the reference's
    smooth_quantize target (reference: tensorrt_llm/models/quantized/
    quant.py:8 wires SmoothQuant layers into GPT specifically). Mirrors
    models.gpt.model.forward, recording the abs-max of every dense input:
    attn_qkv (post ln_1), attn_out (merged attention), fc_in (post ln_2),
    fc_out (post activation). Returns (L, d_in)-stacked numpy stats."""
    from whisper_trtllm_tpu.ops.attention import mha as _mha

    s = tokens.shape[1]
    x = embedding(params["wte"], tokens)
    x = x + params["wpe"][:s][None]

    def body(x, lp):
        b, s, d = x.shape
        h = layer_norm(lp["ln_1"], x, cfg.layer_norm_eps)
        qkv = dense(lp["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        a = _mha(heads(q) * cfg.head_dim ** -0.5, heads(k), heads(v),
                 causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + dense(lp["attn_out"], a)
        h2 = layer_norm(lp["ln_2"], x, cfg.layer_norm_eps)
        mid = ACT2FN[cfg.activation](dense(lp["fc_in"], h2))
        x = x + dense(lp["fc_out"], mid)
        stats = {
            "attn_qkv_in": _amax(h), "attn_out_in": _amax(a),
            "fc_in_in": _amax(h2), "fc_out_in": _amax(mid),
        }
        return x, stats

    _, stats = jax.lax.scan(body, x, params["layers"])
    return jax.tree_util.tree_map(np.asarray, stats)


def smooth_quantize_gpt(params: dict, stats: dict, alpha: float = 0.5) -> dict:
    """Rewrite a GPT tree with SmoothQuant projections (the reference's
    smooth_quantize, models/quantized/quant.py:8 — GPT there and here).
    Embeddings, LayerNorms and the tied vocab head stay floating point."""
    layers = dict(params["layers"])
    for name, key in (("attn_qkv", "attn_qkv_in"), ("attn_out", "attn_out_in"),
                      ("fc_in", "fc_in_in"), ("fc_out", "fc_out_in")):
        layers[name] = _sq_dense(layers[name], stats[key], alpha)
    return {**params, "layers": layers}


def smooth_quantize_whisper(
    params: dict, stats: dict, alpha: float = 0.5
) -> dict:
    """Rewrite the Whisper tree with SmoothQuant projections (QuantMode.
    SMOOTH_QUANT). The conv stem, embeddings, LayerNorms and the tied vocab
    head stay floating point (the reference likewise only smooth-quantizes
    the projection GEMMs, quantization/layer.py:21-...)."""
    enc_layers = dict(params["encoder"]["layers"])
    est = stats["encoder"]
    enc_attn = dict(enc_layers["self_attn"])
    for k in ("q", "k", "v"):
        enc_attn[k] = _sq_dense(enc_attn[k], est["attn_in"], alpha)
    enc_attn["out"] = _sq_dense(enc_attn["out"], est["attn_out_in"], alpha)
    enc_layers["self_attn"] = enc_attn
    enc_layers["fc1"] = _sq_dense(enc_layers["fc1"], est["fc1_in"], alpha)
    enc_layers["fc2"] = _sq_dense(enc_layers["fc2"], est["fc2_in"], alpha)

    dec_layers = dict(params["decoder"]["layers"])
    dst = stats["decoder"]
    dec_self = dict(dec_layers["self_attn"])
    for k in ("q", "k", "v"):
        dec_self[k] = _sq_dense(dec_self[k], dst["attn_in"], alpha)
    dec_self["out"] = _sq_dense(dec_self["out"], dst["attn_out_in"], alpha)
    dec_layers["self_attn"] = dec_self
    dec_cross = dict(dec_layers["encoder_attn"])
    dec_cross["q"] = _sq_dense(dec_cross["q"], dst["cross_in"], alpha)
    for k in ("k", "v"):
        dec_cross[k] = _sq_dense(dec_cross[k], dst["cross_kv_in"], alpha)
    dec_cross["out"] = _sq_dense(dec_cross["out"], dst["cross_out_in"], alpha)
    dec_layers["encoder_attn"] = dec_cross
    dec_layers["fc1"] = _sq_dense(dec_layers["fc1"], dst["fc1_in"], alpha)
    dec_layers["fc2"] = _sq_dense(dec_layers["fc2"], dst["fc2_in"], alpha)

    out = {
        "encoder": {**params["encoder"], "layers": enc_layers},
        "decoder": {**params["decoder"], "layers": dec_layers},
    }
    return out
