"""TPU-native Whisper encoder/decoder.

The flagship model (analog of reference:
tensorrt_llm/models/whisper/model.py:68-516), redesigned for XLA:

- Layers are *stacked* along a leading L axis and executed with
  ``jax.lax.scan`` — one compiled layer body regardless of depth (the
  reference unrolls layers into the TRT graph).
- The decoder's four attention modes (self/cross × with/without cache,
  reference model.py:153-304) collapse into two code paths: a teacher-forced
  full-sequence forward (parity tests / training) and a single-token
  ``decode_step`` against static-shape caches. Cross-attention K/V is computed
  **once** at encode time (``compute_cross_kv``) instead of per-step
  slice/concat games (reference model.py:265-272).
- All shapes static; cache position is an integer, masking does the rest
  (SURVEY.md §7 design inversions 2-3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.layers.init import (
    init_attention,
    init_conv1d,
    init_dense,
    init_embedding,
    init_layer_norm,
)
from whisper_trtllm_tpu.layers.transformer import (
    attention_qkv,
    merge_heads,
    mlp_block,
    split_heads,
)
from whisper_trtllm_tpu.ops.attention import (
    mha,
    mha_decode_step,
    quantize_kv,
    update_kv_cache,
)
from whisper_trtllm_tpu.ops.functional import (
    conv1d,
    dense,
    embedding,
    layer_norm,
    sinusoid_position_embedding,
)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _stack(trees: list) -> dict:
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)



def _vocab_logits(dec: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Tied vocab head (reference model.py:455-457 proj_out tied to
    embeddings), fp32 logits. With an int8-quantized table
    (quantization.quantize_embedding) the per-row scales factor out of the
    contraction over d — the table is read from HBM as int8 (the decode
    loop's largest single weight read) and the upcast fuses into the dot."""
    table = dec["embed_tokens"]
    if isinstance(table, dict):
        logits = jnp.einsum(
            "bsd,vd->bsv", x, table["table_q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * table["scale"].astype(jnp.float32)[None, None, :]
    return jnp.einsum(
        "bsd,vd->bsv", x, table.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def _scan_unroll() -> int:
    """Layer-scan unroll factor for the decode step (trace-time), tunable
    via WHISPER_TPU_SCAN_UNROLL. Measured STRONGLY NEGATIVE on v5e at both
    tiny and medium dims (medium int8 b16: 7.9 ms/step at unroll 1 vs 94 at
    2, 60 at 4 — the unrolled body loses the scanned KV tensors' aliasing
    and materializes per-group cache copies); keep 1 unless re-measured on
    new toolchains. docs/PERFORMANCE.md round-2 medium section."""
    import os

    return int(os.environ.get("WHISPER_TPU_SCAN_UNROLL", "1"))


def _init_encoder_layer(rng, cfg: WhisperConfig) -> dict:
    d = cfg.d_model
    return {
        "self_attn": init_attention(rng, d),
        "self_attn_layer_norm": init_layer_norm(d),
        "fc1": init_dense(rng, d, cfg.encoder_ffn_dim),
        "fc2": init_dense(rng, cfg.encoder_ffn_dim, d),
        "final_layer_norm": init_layer_norm(d),
    }


def _init_decoder_layer(rng, cfg: WhisperConfig) -> dict:
    d = cfg.d_model
    return {
        "self_attn": init_attention(rng, d),
        "self_attn_layer_norm": init_layer_norm(d),
        "encoder_attn": init_attention(rng, d),
        "encoder_attn_layer_norm": init_layer_norm(d),
        "fc1": init_dense(rng, d, cfg.decoder_ffn_dim),
        "fc2": init_dense(rng, cfg.decoder_ffn_dim, d),
        "final_layer_norm": init_layer_norm(d),
    }


def init_params(cfg: WhisperConfig, seed: int = 0) -> dict:
    """Random-init full parameter tree (HF-compatible statistics). Weight
    loading from a real checkpoint replaces this via models/whisper/convert.py
    (analog of reference: examples/whisper/build_encoder.py:72-91)."""
    rng = np.random.default_rng(seed)
    d = cfg.d_model
    encoder = {
        "conv1": init_conv1d(rng, 3, cfg.num_mel_bins, d),
        "conv2": init_conv1d(rng, 3, d, d),
        "embed_positions": sinusoid_position_embedding(cfg.max_source_positions, d),
        "layers": _stack(
            [_init_encoder_layer(rng, cfg) for _ in range(cfg.encoder_layers)]
        ),
        "layer_norm": init_layer_norm(d),
    }
    decoder = {
        "embed_tokens": init_embedding(rng, cfg.vocab_size, d),
        "embed_positions": init_embedding(rng, cfg.max_target_positions, d),
        "layers": _stack(
            [_init_decoder_layer(rng, cfg) for _ in range(cfg.decoder_layers)]
        ),
        "layer_norm": init_layer_norm(d),
    }
    return {"encoder": encoder, "decoder": decoder}


def cast_params(params, dtype) -> dict:
    """Cast floating-point leaves to the compute dtype (bf16 weights for the
    MXU; LayerNorm statistics stay fp32 inside ops.functional.layer_norm).
    float8 storage (fp8_quantize kernels) stays fp8 — upcasting it would
    undo the quantization."""
    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype.itemsize > 1:
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, params)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _encoder_layer(lp: dict, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Pre-LN block: self-attn + GELU MLP (reference:
    tensorrt_llm/models/whisper/model.py:36-66)."""
    h = layer_norm(lp["self_attn_layer_norm"], x)
    q, k, v = attention_qkv(lp["self_attn"], h, None, heads)
    a = merge_heads(mha(q, k, v, causal=False))
    x = x + dense(lp["self_attn"]["out"], a)
    h = layer_norm(lp["final_layer_norm"], x)
    x = x + mlp_block(lp, h)
    return x


def encode(params: dict, cfg: WhisperConfig, mel: jnp.ndarray,
           remat: bool = False) -> jnp.ndarray:
    """mel (B, 3000, n_mels) → encoder states (B, 1500, d).

    Conv stem is a true conv1d (the reference emulates it with Conv2d,
    reference model.py:77-100), then +sinusoid positions, N scanned layers,
    final LN (reference model.py:90-111).

    ``remat=True`` rematerializes per scanned layer (jax.checkpoint on the
    scan body): training stores only the (B, 1500, d) layer boundaries and
    recomputes a layer's internals in the backward — without it a medium.en
    encoder backward wants ~61 GB of activations at batch 16 (measured OOM,
    round 5) vs the chip's 16 GB.
    """
    enc = params["encoder"]
    x = jax.nn.gelu(conv1d(enc["conv1"], mel, stride=1, padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(enc["conv2"], x, stride=2, padding=1), approximate=False)
    x = x + enc["embed_positions"].astype(x.dtype)[None]

    heads = cfg.encoder_attention_heads

    def body(carry, lp):
        return _encoder_layer(lp, carry, heads), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, enc["layers"])
    return layer_norm(enc["layer_norm"], x)


# --------------------------------------------------------------------------
# decoder — teacher-forced full-sequence (parity tests / training)
# --------------------------------------------------------------------------

def _decoder_layer_full(
    lp: dict, x: jnp.ndarray, enc_states: jnp.ndarray, heads: int,
    flash_cross: bool = False,
    ga_weights: Optional[jnp.ndarray] = None,
    ga_row_mask: Optional[jnp.ndarray] = None,
):
    h = layer_norm(lp["self_attn_layer_norm"], x)
    q, k, v = attention_qkv(lp["self_attn"], h, None, heads)
    a = merge_heads(mha(q, k, v, causal=True))
    x = x + dense(lp["self_attn"]["out"], a)

    h = layer_norm(lp["encoder_attn_layer_norm"], x)
    q, k, v = attention_qkv(lp["encoder_attn"], h, enc_states, heads)
    ga_pen = jnp.float32(0.0)
    if ga_weights is not None:
        # guided-attention LOSS (Tachibana et al. 2017): penalize cross-attn
        # probability mass far from the known word slot. An additive score
        # bias was tried first and REJECTED with measurements (it routes
        # position information AROUND q.k so the projections never learn
        # it: biased-training CE 0.0065, unbiased eval garbage — round-4
        # commit trail); the loss's gradient flows INTO q/k, so the
        # monotonic alignment is internalized and survives the prior's
        # removal.
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        pen_rows = jnp.sum(probs * ga_weights[None, None], axis=-1)  # B,H,S
        rm = ga_row_mask[:, None, :]
        ga_pen = jnp.sum(pen_rows * rm) / jnp.maximum(
            jnp.sum(rm) * heads, 1.0)
        a = merge_heads(jnp.einsum(
            "bhst,bhtd->bhsd", probs.astype(v.dtype), v))
    else:
        a = merge_heads(mha(q, k, v, causal=False, use_flash=flash_cross))
    x = x + dense(lp["encoder_attn"]["out"], a)

    h = layer_norm(lp["final_layer_norm"], x)
    x = x + mlp_block(lp, h)
    return x, ga_pen


def decode_full(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    enc_states: jnp.ndarray,
    flash_cross: bool = False,
    ga_weights: Optional[jnp.ndarray] = None,
    ga_row_mask: Optional[jnp.ndarray] = None,
):
    """Teacher-forced decoder forward: tokens (B, S) → logits (B, S, V).

    ``flash_cross`` controls the cross-attention lowering: False (default)
    pins XLA so decode_full stays bitwise-equal to the cached decode_step
    path on TPU (the CLAUDE.md invariant; mha_decode_step has no flash
    variant — flash accumulates P@V in fp32, the step path in the compute
    dtype). Training sets True to run the fused flash kernel with its
    custom-VJP backward (training/train.py).

    ``ga_weights`` (S, T) + ``ga_row_mask`` (B, S): guided-attention LOSS
    penalty weights (training/train.py::guided_attn_weights, training-time
    only — inference paths never pass them). When given, returns
    (logits, mean per-layer attention penalty) instead of logits."""
    dec = params["decoder"]
    s = tokens.shape[1]
    x = embedding(dec["embed_tokens"], tokens, dtype=enc_states.dtype)
    x = x + dec["embed_positions"][:s].astype(x.dtype)[None]

    heads = cfg.decoder_attention_heads

    def body(carry, lp):
        nxt, pen = _decoder_layer_full(lp, carry, enc_states, heads,
                                       flash_cross, ga_weights, ga_row_mask)
        return nxt, pen

    x, pens = jax.lax.scan(body, x, dec["layers"])
    x = layer_norm(dec["layer_norm"], x)
    logits = _vocab_logits(dec, x)
    if ga_weights is not None:
        return logits, jnp.mean(pens)
    return logits


# --------------------------------------------------------------------------
# decoder — incremental decode with static caches
# --------------------------------------------------------------------------

def cross_attention_q(lp: dict, h: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Cross-attention query projection + the (d/heads)**-0.5 scale the
    cached decode paths share (the full-sequence path gets the same scale
    from layers.transformer.attention_qkv — one convention, two entry
    points)."""
    d = h.shape[-1]
    return split_heads(
        dense(lp["encoder_attn"]["q"], h) * (d // heads) ** -0.5, heads)


def compute_cross_kv(
    params: dict, cfg: WhisperConfig, enc_states: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention K/V for all layers, computed once per utterance:
    (L, B, H, 1500, dh) ×2. The reference instead re-projects or slice/concats
    encoder K/V *every step* through the engine boundary
    (reference model.py:265-272) — this is the single biggest decode-loop
    saving."""
    heads = cfg.decoder_attention_heads

    def body(_, lp):
        ca = lp["encoder_attn"]
        k = split_heads(dense(ca["k"], enc_states), heads)
        v = split_heads(dense(ca["v"], enc_states), heads)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, params["decoder"]["layers"])
    # pad T to a multiple of 8 (sublane alignment for the Pallas decode
    # kernel; 1500 → 1504) — or of the fused decode kernel's streaming block
    # (1500 → 1536) when that path is enabled. Padding is masked out via the
    # true length in decode_step, so it never contributes to the softmax.
    from whisper_trtllm_tpu.ops.pallas import fused_decode_enabled

    mult = 8
    if fused_decode_enabled():
        from whisper_trtllm_tpu.ops.pallas.fused_decoder_step import CROSS_BLOCK

        mult = CROSS_BLOCK
    pad = (-ks.shape[3]) % mult
    if pad:
        widths = [(0, 0)] * 5
        widths[3] = (0, pad)
        ks, vs = jnp.pad(ks, widths), jnp.pad(vs, widths)
    return ks, vs


def init_self_kv(
    cfg: WhisperConfig, batch: int, max_len: Optional[int] = None, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static self-attention KV cache (L, B, H, max_len, dh) ×2."""
    max_len = max_len or cfg.max_target_positions
    shape = (
        cfg.decoder_layers,
        batch,
        cfg.decoder_attention_heads,
        max_len,
        cfg.decoder_head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def quantize_cross_kv(
    cross_k: jnp.ndarray, cross_v: jnp.ndarray, dtype=jnp.int8
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Float cross-KV → quantized 4-tuple (kq, ks, vq, vs) for
    decode_step_kv (QuantMode.INT8_KV_CACHE / FP8_KV_CACHE; cross-KV
    dominates per-step decode HBM traffic since all 1500 encoder positions
    are read every token)."""
    kq, ks = quantize_kv(cross_k, dtype)
    vq, vs = quantize_kv(cross_v, dtype)
    return kq, ks, vq, vs


def transpose_cross_kv(cross_kv: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
    """(L, B, H, Tc, dh) cross-KV tuple → T-minor (L, B, H, dh, Tc).

    The dh=64 minor dim leaves TPU HBM tiles half-empty (int8 tiles are
    (32, 128), bf16 (16, 128)), so every full-cache cross-attention read
    moves ~2x the useful bytes; T-minor fills the lanes. Measured 2.38x per
    medium.en decode step on v5e (scripts/cross_attn_probe.py, docs/
    PERFORMANCE.md round-3 medium section). Works on the float 2-tuple and
    the quantized 4-tuple (per-token scales keep their (L, B, H, Tc, 1)
    shape — they are ~dh x smaller than the caches). decode_step_kv detects
    the layout from the static shapes; no flag threads through the loops."""
    if len(cross_kv) == 4:
        kq, ks, vq, vs = cross_kv
        return (jnp.swapaxes(kq, -1, -2), ks, jnp.swapaxes(vq, -1, -2), vs)
    k, v = cross_kv
    return jnp.swapaxes(k, -1, -2), jnp.swapaxes(v, -1, -2)


def cross_kv_t_major(cfg: WhisperConfig, cross_kv: Tuple[jnp.ndarray, ...]) -> bool:
    """True iff the cross-KV tuple is stored T-minor ((..., dh, Tc) instead
    of (..., Tc, dh)) — static shape inspection, unambiguous whenever the
    padded encoder length differs from head_dim (always, for real configs;
    equal-dim toy configs read as the default dh-minor layout)."""
    dh = cfg.decoder_head_dim
    k = cross_kv[0]
    return k.shape[-2] == dh and k.shape[-1] != dh


def init_self_kv_quant(
    cfg: WhisperConfig, batch: int, max_len: Optional[int] = None,
    dtype=jnp.int8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantized self-KV cache: (values int8/fp8, scales fp32) ×2, leading
    L axis."""
    max_len = max_len or cfg.max_target_positions
    shape = (
        cfg.decoder_layers, batch, cfg.decoder_attention_heads,
        max_len, cfg.decoder_head_dim,
    )
    sshape = shape[:-1] + (1,)
    return (
        jnp.zeros(shape, dtype), jnp.ones(sshape, jnp.float32),
        jnp.zeros(shape, dtype), jnp.ones(sshape, jnp.float32),
    )


def init_self_kv_int8(
    cfg: WhisperConfig, batch: int, max_len: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    return init_self_kv_quant(cfg, batch, max_len, jnp.int8)


def _fused_decode_ok(dec: dict, self_k: jnp.ndarray,
                     cross_k: jnp.ndarray, pos) -> bool:
    """Gate for the fused whole-layer decode kernel: float caches, lockstep
    scalar position, unfused unquantized projections, and a VMEM fit
    (ops/pallas/fused_decoder_step.py)."""
    from whisper_trtllm_tpu.ops.pallas import (
        fused_decode_enabled,
        fused_layer_supported,
    )

    if not fused_decode_enabled():
        return False
    if getattr(pos, "ndim", 0) != 0:
        return False
    lp = dec["layers"]
    sa, ca = lp["self_attn"], lp["encoder_attn"]
    if "qkv" in sa:
        return False
    for blk in (sa["q"], sa["k"], sa["v"], sa["out"], ca["q"], ca["out"],
                lp["fc1"], lp["fc2"]):
        if "kernel" not in blk:
            return False
    _, b, h, ts, dh = self_k.shape
    d = h * dh
    ffn = lp["fc1"]["kernel"].shape[-1]
    return fused_layer_supported(
        b, h, ts, dh, cross_k.shape[3], d, ffn, self_k.dtype.itemsize)


def _decode_step_fused(dec, cfg: WhisperConfig, x, pos, self_kv, cross_kv):
    """decode_step_kv's layer loop via the fused Pallas kernel: per layer,
    XLA does LN1 + the K/V projections + the one-row in-place cache append,
    the kernel does everything else in one launch."""
    from whisper_trtllm_tpu.ops.pallas import fused_decoder_layer_step

    heads = cfg.decoder_attention_heads
    enc_len = int(cfg.max_source_positions)

    def body(x, xs):
        lp, sk, sv, ck, cv = xs
        h = layer_norm(lp["self_attn_layer_norm"], x)
        sa = lp["self_attn"]
        k_new = split_heads(dense(sa["k"], h), heads)
        v_new = split_heads(dense(sa["v"], h), heads)
        sk, sv = update_kv_cache(sk, sv, k_new, v_new, pos)
        x2 = fused_decoder_layer_step(
            x[:, 0], h[:, 0], pos, lp, sk, sv, ck, cv, enc_len)
        return x2[:, None], (sk, sv)

    x, new_self = jax.lax.scan(
        body, x, (dec["layers"],) + tuple(self_kv) + tuple(cross_kv))
    x = layer_norm(dec["layer_norm"], x)
    return _vocab_logits(dec, x)[:, 0], new_self


def decode_step_kv(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_kv: Tuple[jnp.ndarray, ...],
    cross_kv: Tuple[jnp.ndarray, ...],
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """One decode step with pluggable cache precision.

    ``self_kv``/``cross_kv`` are either float 2-tuples (k, v) or int8
    4-tuples (k_q, k_scale, v_q, v_scale) — the int8 form is the reference's
    INT8_KV_CACHE mode (reference: tensorrt_llm/quantization/mode.py +
    attention int8 KV handling, layers/attention.py:235-245). Returns
    (logits (B, V) fp32, updated self_kv tuple).
    """
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    n_self = len(self_kv)
    int8_self = n_self == 4
    int8_cross = len(cross_kv) == 4
    t_major = cross_kv_t_major(cfg, cross_kv)

    x = embedding(dec["embed_tokens"], tokens[:, None])
    x = x + jax.lax.dynamic_slice_in_dim(
        dec["embed_positions"], pos, 1, axis=0
    ).astype(x.dtype)[None]

    if not (int8_self or int8_cross or t_major) and _fused_decode_ok(
        dec, self_kv[0], cross_kv[0], pos
    ):
        return _decode_step_fused(dec, cfg, x, pos, self_kv, cross_kv)

    def body(x, xs):
        lp = xs[0]
        s = xs[1 : 1 + n_self]
        c = xs[1 + n_self :]
        # self-attention with cache append at `pos`
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k_new, v_new = attention_qkv(lp["self_attn"], h, None, heads)
        if int8_self:
            skq, sks, svq, svs = s
            k_q, k_s = quantize_kv(k_new, skq.dtype)
            v_q, v_s = quantize_kv(v_new, svq.dtype)
            skq, svq = update_kv_cache(skq, svq, k_q, v_q, pos)
            sks, svs = update_kv_cache(sks, svs, k_s, v_s, pos)
            a = mha_decode_step(q, skq, svq, pos + 1, k_scale=sks, v_scale=svs)
            new_s = (skq, sks, svq, svs)
        else:
            sk, sv = update_kv_cache(s[0], s[1], k_new, v_new, pos)
            a = mha_decode_step(q, sk, sv, pos + 1)
            new_s = (sk, sv)
        x = x + dense(lp["self_attn"]["out"], merge_heads(a))
        # cross-attention against precomputed K/V; the true encoder length
        # masks out any alignment padding in the cache
        h = layer_norm(lp["encoder_attn_layer_norm"], x)
        d = x.shape[-1]
        qc = cross_attention_q(lp, h, heads)
        enc_len = jnp.int32(cfg.max_source_positions)
        if int8_cross:
            a = mha_decode_step(qc, c[0], c[2], enc_len, k_scale=c[1],
                                v_scale=c[3], t_major=t_major)
        else:
            a = mha_decode_step(qc, c[0], c[1], enc_len, t_major=t_major)
        x = x + dense(lp["encoder_attn"]["out"], merge_heads(a))
        # MLP
        h = layer_norm(lp["final_layer_norm"], x)
        x = x + mlp_block(lp, h)
        return x, new_s

    x, new_self = jax.lax.scan(
        body, x, (dec["layers"],) + tuple(self_kv) + tuple(cross_kv),
        unroll=_scan_unroll(),
    )
    x = layer_norm(dec["layer_norm"], x)
    logits = _vocab_logits(dec, x)[:, 0]
    return logits, new_self


def decode_step(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_k: jnp.ndarray,
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step for the whole batch, fully on device (float caches).

    tokens: (B,) int32 current-step input; pos: scalar int32 position.
    Returns (logits (B, V) fp32, updated self_k, self_v).

    This is the TPU replacement for the reference's per-step engine enqueue
    with shape inference + output malloc + 5 cache clones + synchronize
    (reference: examples/whisper/run.py:128-148).
    """
    logits, (self_k, self_v) = decode_step_kv(
        params, cfg, tokens, pos, (self_k, self_v), (cross_k, cross_v)
    )
    return logits, self_k, self_v


def decode_step_ragged_kv(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_kv: Tuple[jnp.ndarray, ...],
    cross_kv: Tuple[jnp.ndarray, ...],
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Per-lane decode step with pluggable cache precision: like
    ``decode_step_kv`` but ``pos`` is a (B,) vector — every batch lane sits
    at its own sequence position, so lanes carry *different utterances at
    different stages* (the in-flight-batching primitive; analog of the
    reference's per-request cache pointers,
    cpp/tensorrt_llm/plugins/ibGptAttentionPlugin/).

    ``self_kv``/``cross_kv``: float 2-tuples or quantized 4-tuples
    (k_q, k_scale, v_q, v_scale), same conventions as ``decode_step_kv`` —
    the serving (in-flight) path must offer the same INT8/FP8_KV_CACHE
    modes as the lockstep path (ADVICE r4: cli/serve --backend ifb silently
    ignored --kv-cache-dtype)."""
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    pos = pos.astype(jnp.int32)
    n_self = len(self_kv)
    quant_self = n_self == 4
    quant_cross = len(cross_kv) == 4
    t_major = cross_kv_t_major(cfg, cross_kv)

    x = embedding(dec["embed_tokens"], tokens[:, None])
    x = x + jnp.take(dec["embed_positions"], pos, axis=0).astype(x.dtype)[:, None]

    def body(x, xs):
        lp = xs[0]
        s = xs[1 : 1 + n_self]
        c = xs[1 + n_self :]
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k_new, v_new = attention_qkv(lp["self_attn"], h, None, heads)
        if quant_self:
            skq, sks, svq, svs = s
            k_q, k_s = quantize_kv(k_new, skq.dtype)
            v_q, v_s = quantize_kv(v_new, svq.dtype)
            skq, svq = update_kv_cache(skq, svq, k_q, v_q, pos)
            sks, svs = update_kv_cache(sks, svs, k_s, v_s, pos)
            a = mha_decode_step(q, skq, svq, pos + 1, k_scale=sks, v_scale=svs)
            new_s = (skq, sks, svq, svs)
        else:
            sk, sv = update_kv_cache(s[0], s[1], k_new, v_new, pos)
            a = mha_decode_step(q, sk, sv, pos + 1)
            new_s = (sk, sv)
        x = x + dense(lp["self_attn"]["out"], merge_heads(a))

        h = layer_norm(lp["encoder_attn_layer_norm"], x)
        qc = cross_attention_q(lp, h, heads)
        enc_len = jnp.int32(cfg.max_source_positions)
        if quant_cross:
            a = mha_decode_step(qc, c[0], c[2], enc_len, k_scale=c[1],
                                v_scale=c[3], t_major=t_major)
        else:
            a = mha_decode_step(qc, c[0], c[1], enc_len, t_major=t_major)
        x = x + dense(lp["encoder_attn"]["out"], merge_heads(a))

        h = layer_norm(lp["final_layer_norm"], x)
        x = x + mlp_block(lp, h)
        return x, new_s

    x, new_self = jax.lax.scan(
        body, x, (dec["layers"],) + tuple(self_kv) + tuple(cross_kv)
    )
    x = layer_norm(dec["layer_norm"], x)
    logits = _vocab_logits(dec, x)[:, 0]
    return logits, new_self


def decode_step_ragged(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_k: jnp.ndarray,
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Float-cache ragged step (see ``decode_step_ragged_kv``)."""
    logits, (self_k, self_v) = decode_step_ragged_kv(
        params, cfg, tokens, pos, (self_k, self_v), (cross_k, cross_v)
    )
    return logits, self_k, self_v


def decode_chunk(
    params: dict,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_kv: Tuple[jnp.ndarray, ...],
    cross_kv: Tuple[jnp.ndarray, ...],
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Multi-token decode: process a chunk of S tokens at positions
    [pos, pos+S) against the cache in ONE pass (the "context phase" of the
    reference's gptAttentionPlugin, reference: cpp/tensorrt_llm/plugins/
    gptAttentionPlugin/ — causal within the chunk, full visibility of the
    cached prefix). Float caches only. Returns (logits (B, S, V) fp32,
    updated self_kv). Used for prompt prefill and speculative verification.
    """
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    b, s = tokens.shape
    sk0, sv0 = self_kv
    t = sk0.shape[3]

    x = embedding(dec["embed_tokens"], tokens)
    pos_emb = jax.lax.dynamic_slice_in_dim(dec["embed_positions"], pos, s, axis=0)
    x = x + pos_emb.astype(x.dtype)[None]

    # mask over cache columns: column c visible to chunk row r iff c <= pos+r
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, t), 3)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, t), 2)
    vis = col <= (pos + row)
    addmask = jnp.where(vis, 0.0, -1e9).astype(jnp.float32)

    def body(x, xs):
        lp, sk, sv, ck, cv = xs
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k_new, v_new = attention_qkv(lp["self_attn"], h, None, heads)
        zero = jnp.zeros((), jnp.int32)
        sk = jax.lax.dynamic_update_slice(
            sk, k_new.astype(sk.dtype), (zero, zero, pos, zero))
        sv = jax.lax.dynamic_update_slice(
            sv, v_new.astype(sv.dtype), (zero, zero, pos, zero))
        a = merge_heads(mha(q, sk, sv, mask=addmask))
        x = x + dense(lp["self_attn"]["out"], a)

        h = layer_norm(lp["encoder_attn_layer_norm"], x)
        d = x.shape[-1]
        qc = cross_attention_q(lp, h, heads)
        tc = ck.shape[2]
        ccol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tc), 3)
        cmask = jnp.where(ccol < cfg.max_source_positions, 0.0, -1e9).astype(jnp.float32)
        a = merge_heads(mha(qc, ck, cv, mask=cmask))
        x = x + dense(lp["encoder_attn"]["out"], a)

        h = layer_norm(lp["final_layer_norm"], x)
        x = x + mlp_block(lp, h)
        return x, (sk, sv)

    x, new_self = jax.lax.scan(
        body, x, (dec["layers"], sk0, sv0) + tuple(cross_kv)
    )
    x = layer_norm(dec["layer_norm"], x)
    logits = _vocab_logits(dec, x)
    return logits, new_self


def fuse_qkv_params(params: dict) -> dict:
    """Fuse each self-attention's q/k/v projections into one (d, 3d) matmul
    (the reference's fused-QKV layout, reference:
    tensorrt_llm/layers/attention.py:48, with the zero k-bias of
    examples/whisper/build_encoder.py:79-86). Numerically identical;
    fewer matmul dispatches per decode step (measured neutral on v5e, see
    docs/PERFORMANCE.md). Cross-attention stays split (its K/V are
    precomputed once at encode time). Untouched subtrees are shared, not
    copied — only the fused projections allocate."""

    def fuse(attn: dict) -> dict:
        q, k, v = attn["q"], attn["k"], attn["v"]
        kernel = np.concatenate(
            [np.asarray(q["kernel"]), np.asarray(k["kernel"]),
             np.asarray(v["kernel"])], axis=-1)
        d_out = np.asarray(q["kernel"]).shape[-1]
        zeros_k = np.zeros_like(np.asarray(q.get("bias", np.zeros(d_out))))
        bias = np.concatenate(
            [np.asarray(q.get("bias", zeros_k)), zeros_k,
             np.asarray(v.get("bias", zeros_k))], axis=-1)
        return {"qkv": {"kernel": kernel, "bias": bias}, "out": attn["out"]}

    out = dict(params)
    for side in ("encoder", "decoder"):
        side_tree = dict(out[side])
        layers = dict(side_tree["layers"])
        layers["self_attn"] = fuse(layers["self_attn"])
        side_tree["layers"] = layers
        out[side] = side_tree
    return out
