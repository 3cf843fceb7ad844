"""ChatGLM-6B decoder-only model (zoo breadth).

Analog of the reference's ChatGLM-6B family (reference:
tensorrt_llm/models/chatglm6b/model.py). The GLM-specific machinery, each
mirrored here TPU-natively:

- **2D rotary embeddings** (reference model.py:151-175): head_dim splits
  into two halves; half 0 rotates by the *position* channel, half 1 by the
  *block-position* channel, each in the neox half-rotation convention over
  its 64 dims. The reference gathers cos/sin from learned-layout embedding
  tables (model.py:351-357, 394-416); we compute them in closed form.
- **GLM post-LN residual scaling** (reference model.py:290-310):
  ``x = ln(x); x = x*alpha + attn(x)`` with ``alpha = (2*n_layer)**0.5``
  (7.484375 for the 28-layer 6B model — the literal at model.py:304,308).
- **Prefix-LM ("bidirectional") mask** (reference model.py:366 —
  AttentionMaskType.bidirectional): every token attends to the whole
  prompt; generated positions are causal among themselves.
- Per-head-interleaved fused QKV (reference model.py:120-144), gelu MLP,
  final LN then a separate (non-tied) lm_head.

Position ids follow the GLM convention (reference
examples/chatglm6b/run.py): channel 0 counts 0..ctx-1 then freezes at the
mask position; channel 1 is 0 over the prompt then 1,2,3... per generated
token. ``build_position_ids`` constructs them.

No HF twin ships in the baked-in transformers (ChatGLM-6B is a
trust_remote_code model), so the parity test carries its own torch
reference implementing the semantics above (the reference repo's own
tests/functional/torch_ref.py pattern).
"""

from __future__ import annotations

import dataclasses
import functools
import json
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.layers.init import init_dense, init_embedding, init_layer_norm
from whisper_trtllm_tpu.ops.attention import mha_decode_step, update_kv_cache
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm


@dataclass(frozen=True)
class ChatGLM6BConfig:
    vocab_size: int = 130528
    max_positions: int = 2048
    d_model: int = 4096
    n_layer: int = 28
    n_head: int = 32
    ffn_dim: int = 16384
    activation: str = "gelu"
    eos_token_id: int = 130005

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @property
    def residual_alpha(self) -> float:
        return (2.0 * self.n_layer) ** 0.5

    @classmethod
    def testing(cls, **overrides) -> "ChatGLM6BConfig":
        kw = dict(vocab_size=89, max_positions=32, d_model=32, n_layer=2,
                  n_head=4, ffn_dim=64, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def build_position_ids(seq_len: int, mask_pos: int, ctx_len: int) -> np.ndarray:
    """GLM 2-channel position ids (2, S) for a single sequence whose prompt
    occupies [0, ctx_len) with the [gMASK] at ``mask_pos`` (reference:
    examples/chatglm6b/run.py position-id construction)."""
    pos = np.arange(seq_len, dtype=np.int32)
    pos = np.where(pos < ctx_len, pos, mask_pos).astype(np.int32)
    block = np.maximum(np.arange(seq_len, dtype=np.int32) - (ctx_len - 1), 0)
    return np.stack([pos, block], axis=0)


def glm_rope_tables(half: int, positions: jnp.ndarray):
    """positions (...,) → cos/sin (..., half) in the neox half-rotation
    layout over ``half`` dims (the closed form of the reference's
    position_embedding_cos/sin tables, reference model.py:351-357)."""
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([angles, angles], axis=-1)  # (..., half)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_2d_rope(x: jnp.ndarray, cos0, sin0, cos1, sin1) -> jnp.ndarray:
    """x (B, H, S, dh): half 0 rotated by the position channel, half 1 by the
    block-position channel (reference model.py:158-173 rotate_embedding)."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    y0 = x0 * cos0[:, None] + _rotate_half(x0) * sin0[:, None]
    y1 = x1 * cos1[:, None] + _rotate_half(x1) * sin1[:, None]
    return jnp.concatenate([y0, y1], axis=-1).astype(x.dtype)


def _init_layer(rng, cfg: ChatGLM6BConfig) -> dict:
    d = cfg.d_model
    return {
        "input_ln": init_layer_norm(d),
        "q": init_dense(rng, d, d),
        "k": init_dense(rng, d, d),
        "v": init_dense(rng, d, d),
        "attn_out": init_dense(rng, d, d),
        "post_ln": init_layer_norm(d),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
    }


def init_params(cfg: ChatGLM6BConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "embed_tokens": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": init_layer_norm(cfg.d_model),
        "lm_head": init_dense(rng, cfg.d_model, cfg.vocab_size, bias=False),
    }


def forward(
    params: dict,
    cfg: ChatGLM6BConfig,
    tokens: jnp.ndarray,
    position_ids: jnp.ndarray,
    ctx_len: int,
) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S), position_ids (B, 2, S) → logits
    (B, S, V) fp32. ``ctx_len`` sets the prefix-LM boundary: positions
    < ctx_len are visible to everyone, the rest are causal."""
    b, s = tokens.shape
    dh = cfg.head_dim
    alpha = cfg.residual_alpha
    x = embedding(params["embed_tokens"], tokens)

    quarter = dh // 2
    cos0, sin0 = glm_rope_tables(quarter, position_ids[:, 0])  # (B, S, dh/2)
    cos1, sin1 = glm_rope_tables(quarter, position_ids[:, 1])

    # prefix-LM mask: attend iff key is in the prompt or key <= query
    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    allowed = (k_pos < ctx_len) | (k_pos <= q_pos)          # (S, S)

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, lp):
        h = layer_norm(lp["input_ln"], x)
        q = apply_2d_rope(heads(dense(lp["q"], h)), cos0, sin0, cos1, sin1)
        k = apply_2d_rope(heads(dense(lp["k"], h)), cos0, sin0, cos1, sin1)
        v = heads(dense(lp["v"], h))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * dh ** -0.5, k,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(allowed[None, None], scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        # GLM residual: the *layernormed* branch is the residual, scaled
        x = h * alpha + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x)
        x = h * alpha + dense(
            lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["final_ln"], x)
    return dense(params["lm_head"], x).astype(jnp.float32)


def _prefill(params, cfg: ChatGLM6BConfig, tokens, position_ids, ctx_len,
             cache_k, cache_v):
    """Context phase: the prefix-LM forward, writing post-rope K and V into
    the static caches (the GLM analog of the reference's
    ChatGLM6BHeadModelGenerationSession context step, reference:
    tensorrt_llm/runtime/generation.py:1000)."""
    b, s = tokens.shape
    dh = cfg.head_dim
    alpha = cfg.residual_alpha
    x = embedding(params["embed_tokens"], tokens)

    quarter = dh // 2
    cos0, sin0 = glm_rope_tables(quarter, position_ids[:, 0])
    cos1, sin1 = glm_rope_tables(quarter, position_ids[:, 1])

    per_lane = getattr(ctx_len, "ndim", 0) == 1
    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    if per_lane:
        # per-row prefix boundary (ragged right-padded batch): the GLM
        # prefix-LM mask with each row's own ctx_len
        allowed = ((k_pos[None] < ctx_len[:, None, None])
                   | (k_pos <= q_pos)[None])[:, None]       # (B, 1, S, S)
    else:
        allowed = ((k_pos < ctx_len) | (k_pos <= q_pos))[None, None]

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["input_ln"], x)
        q = apply_2d_rope(heads(dense(lp["q"], h)), cos0, sin0, cos1, sin1)
        k = apply_2d_rope(heads(dense(lp["k"], h)), cos0, sin0, cos1, sin1)
        v = heads(dense(lp["v"], h))
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * dh ** -0.5, k,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(allowed, scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = h * alpha + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x)
        x = h * alpha + dense(
            lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    x = layer_norm(params["final_ln"], x)
    if per_lane:
        from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

        x_last = gather_last_token_logits(x, ctx_len)
    else:
        x_last = x[:, -1]
    logits = dense(params["lm_head"], x_last).astype(jnp.float32)
    return logits, cache_k, cache_v


def _step(params, cfg: ChatGLM6BConfig, tok, pos, mask_pos, ctx_len,
          cache_k, cache_v):
    """Generation phase. GLM position ids for a generated token at absolute
    position ``pos``: channel 0 frozen at the [gMASK] position, channel 1 =
    pos - (ctx_len - 1). Every cached position is visible (prefix-LM: the
    prompt is bidirectional and all earlier generated tokens precede the
    query), so plain valid_len masking suffices."""
    b = tok.shape[0]
    dh = cfg.head_dim
    alpha = cfg.residual_alpha
    x = embedding(params["embed_tokens"], tok[:, None])

    quarter = dh // 2
    # mask_pos / ctx_len / pos are scalars (lockstep) or (B,) vectors
    # (ragged batches — each lane's own [gMASK] index and prefix length)
    lanes = jnp.zeros((b,), jnp.int32)
    p0 = (lanes + jnp.asarray(mask_pos, jnp.int32))[:, None]
    p1 = (lanes + pos - (jnp.asarray(ctx_len, jnp.int32) - 1))[:, None]
    cos0, sin0 = glm_rope_tables(quarter, p0)
    cos1, sin1 = glm_rope_tables(quarter, p1)

    def heads(t):
        return t.reshape(b, 1, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["input_ln"], x)
        q = apply_2d_rope(heads(dense(lp["q"], h)), cos0, sin0, cos1, sin1)
        k = apply_2d_rope(heads(dense(lp["k"], h)), cos0, sin0, cos1, sin1)
        v = heads(dense(lp["v"], h))
        ck, cv = update_kv_cache(ck, cv, k, v, pos)
        a = mha_decode_step(q * dh ** -0.5, ck, cv, pos + 1)
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = h * alpha + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x)
        x = h * alpha + dense(
            lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    x = layer_norm(params["final_ln"], x)
    logits = dense(params["lm_head"], x[:, 0]).astype(jnp.float32)
    return logits, cache_k, cache_v


@functools.lru_cache(maxsize=16)
def _compiled_generate(cfg: ChatGLM6BConfig, prompt_len: int, max_len: int,
                       mask_pos: int, sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    pos_np = build_position_ids(prompt_len, mask_pos, prompt_len)  # (2, P)

    def fn(params, prompt):
        b = prompt.shape[0]
        position_ids = jnp.broadcast_to(
            jnp.asarray(pos_np)[None], (b, 2, prompt_len)
        )
        return causal_lm.generate_tokens(
            lambda p, t, ck, cv: _prefill(
                p, cfg, t, position_ids, prompt_len, ck, cv),
            lambda p, tok, pos, ck, cv: _step(
                p, cfg, tok, pos, mask_pos, prompt_len, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_len=max_len,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate(params: dict, cfg: ChatGLM6BConfig, prompt: jnp.ndarray,
             max_new_tokens: int, mask_pos: int | None = None,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 0.0,
             repetition_penalty: float = 1.0, seed: int = 0,
             do_sample: bool = False) -> jnp.ndarray:
    """Cached GLM generation — the analog of the reference's dedicated
    ChatGLM6BHeadModelGenerationSession (reference:
    tensorrt_llm/runtime/generation.py:1000), which exists exactly because
    GLM's per-step position ids differ from GPT's. ``mask_pos`` is the
    [gMASK] index in the prompt (defaults to the second-to-last position,
    the GLM convention of prompt + [gMASK] + <sop>)."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    prompt_len = prompt.shape[1]
    if mask_pos is None:
        mask_pos = prompt_len - 2
    max_len = min(cfg.max_positions, prompt_len + max_new_tokens)
    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    return _compiled_generate(cfg, prompt_len, max_len, int(mask_pos), sc)(
        params, prompt)


@functools.lru_cache(maxsize=16)
def _compiled_generate_beam(cfg: ChatGLM6BConfig, prompt_len: int,
                            max_new_tokens: int, mask_pos: int,
                            num_beams: int, length_penalty: float):
    from whisper_trtllm_tpu.runtime import beam_lm

    pos_np = build_position_ids(prompt_len, mask_pos, prompt_len)

    def fn(params, prompt):
        b = prompt.shape[0]
        max_len = prompt_len + max_new_tokens
        position_ids = jnp.broadcast_to(
            jnp.asarray(pos_np)[None], (b, 2, prompt_len))
        return beam_lm.beam_generate_tokens(
            lambda p, t, ck, cv: _prefill(
                p, cfg, t, position_ids, prompt_len, ck, cv),
            lambda p, tok, pos, ck, cv: _step(
                p, cfg, tok, pos, mask_pos, prompt_len, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, num_beams=num_beams,
            length_penalty=length_penalty,
        )

    return jax.jit(fn)


def generate_beam(params: dict, cfg: ChatGLM6BConfig, prompt: jnp.ndarray,
                  max_new_tokens: int, num_beams: int,
                  length_penalty: float = 1.0, mask_pos: int | None = None):
    """GLM beam search — bespoke wiring because the generation-phase
    position ids are (mask_pos, pos - ctx_len + 1), not pos (the same
    reason the reference ships a dedicated ChatGLM6BHeadModelGeneration-
    Session, reference: tensorrt_llm/runtime/generation.py:1000). The
    prefill runs once per utterance at beam 1; beam_lm tiles K-wide, so
    the broadcast position ids follow the batch automatically."""
    prompt_len = prompt.shape[1]
    if mask_pos is None:
        mask_pos = prompt_len - 2
    if prompt_len + max_new_tokens > cfg.max_positions:
        raise ValueError("prompt_len + max_new_tokens exceeds max_positions")
    return _compiled_generate_beam(
        cfg, prompt_len, max_new_tokens, int(mask_pos), num_beams,
        float(length_penalty))(params, prompt)


def _prefill_ragged(params, cfg: ChatGLM6BConfig, tokens, lens,
                    cache_k, cache_v):
    """Context phase over a right-padded ragged batch: per-row GLM position
    ids (ch0 = arange clamped to the row's [gMASK], ch1 = 0 over the
    prefix), per-row prefix-LM mask, logits gathered at each row's last
    valid position."""
    b, s = tokens.shape
    ar = jnp.arange(s, dtype=jnp.int32)
    pos0 = jnp.where(ar[None] < lens[:, None], ar[None], (lens - 2)[:, None])
    pos1 = jnp.maximum(ar[None] - (lens[:, None] - 1), 0)
    position_ids = jnp.stack([pos0, pos1], axis=1)          # (B, 2, S)
    return _prefill(params, cfg, tokens, position_ids, lens,
                    cache_k, cache_v)


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: ChatGLM6BConfig, prompt_pad: int,
                              max_new_tokens: int, sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt, lens):
        b = prompt.shape[0]
        max_len = prompt_pad + max_new_tokens
        mask_pos = lens - 2                                  # GLM convention
        return causal_lm.generate_tokens_ragged(
            lambda p, t, l, ck, cv: _prefill_ragged(p, cfg, t, l, ck, cv),
            lambda p, tok, pos, ck, cv: _step(
                p, cfg, tok, pos, mask_pos, lens, ck, cv),
            params, prompt, lens,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate_ragged(params: dict, cfg: ChatGLM6BConfig, prompt: jnp.ndarray,
                    prompt_lens, max_new_tokens: int,
                    temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 0.0, repetition_penalty: float = 1.0,
                    seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """Ragged (per-row input-length) GLM generation: each lane carries its
    own [gMASK] index (lens-2), prefix boundary, and 2D-rope block
    positions — the last zoo family to gain the reference's
    decode(input_ids, input_lengths) path (reference:
    tensorrt_llm/runtime/generation.py:782,1000; the dedicated GLM session
    exists precisely because these position ids differ per step)."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
    return _compiled_generate_ragged(
        cfg, prompt.shape[1], max_new_tokens, sc)(params, prompt, prompt_lens)


def convert_hf_chatglm6b(state_dict: dict, cfg: ChatGLM6BConfig) -> dict:
    """THUDM/chatglm-6b state-dict (numpy arrays, original key names) →
    params. The fused query_key_value is per-head-interleaved:
    (3d, d) viewed as (heads, 3, dh, d) (reference model.py:120-144)."""
    sd = state_dict
    d, h, dh = cfg.d_model, cfg.n_head, cfg.head_dim

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    layers = []
    for i in range(cfg.n_layer):
        p = f"transformer.layers.{i}"
        qkv_w = sd[p + ".attention.query_key_value.weight"].reshape(h, 3, dh, d)
        qkv_b = sd[p + ".attention.query_key_value.bias"].reshape(h, 3, dh)

        def proj(j):
            return {
                "kernel": np.ascontiguousarray(qkv_w[:, j].reshape(d, d).T),
                "bias": qkv_b[:, j].reshape(d),
            }

        layers.append({
            "input_ln": ln(p + ".input_layernorm"),
            "q": proj(0),
            "k": proj(1),
            "v": proj(2),
            "attn_out": {
                "kernel": np.ascontiguousarray(
                    sd[p + ".attention.dense.weight"].T),
                "bias": sd[p + ".attention.dense.bias"],
            },
            "post_ln": ln(p + ".post_attention_layernorm"),
            "fc_in": {
                "kernel": np.ascontiguousarray(
                    sd[p + ".mlp.dense_h_to_4h.weight"].T),
                "bias": sd[p + ".mlp.dense_h_to_4h.bias"],
            },
            "fc_out": {
                "kernel": np.ascontiguousarray(
                    sd[p + ".mlp.dense_4h_to_h.weight"].T),
                "bias": sd[p + ".mlp.dense_4h_to_h.bias"],
            },
        })
    return {
        "embed_tokens": sd["transformer.word_embeddings.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": ln("transformer.final_layernorm"),
        "lm_head": {
            "kernel": np.ascontiguousarray(sd["lm_head.weight"].T)},
    }
