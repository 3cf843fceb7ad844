"""LLaMA-family decoder-only model (zoo breadth).

Analog of the reference's LLaMA family (reference:
tensorrt_llm/models/llama/model.py — RMSNorm, rotary embeddings, gated SiLU
MLP, optional grouped-query attention), on the same scanned-layer/static-
KV-cache machinery as the GPT and Whisper models. Converts from HF
LlamaForCausalLM for parity tests.
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

from whisper_trtllm_tpu.layers.init import init_dense, init_embedding
from whisper_trtllm_tpu.ops.attention import mha, mha_decode_step, update_kv_cache
from whisper_trtllm_tpu.ops.functional import dense, embedding, rms_norm


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    max_positions: int = 4096
    d_model: int = 4096
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 32          # < n_head → grouped-query attention
    ffn_dim: int = 11008
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    eos_token_id: int = 2
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "LlamaConfig":
        kw = dict(vocab_size=89, max_positions=32, d_model=32, n_layer=2,
                  n_head=4, n_kv_head=2, ffn_dim=56, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


# -- rotary embeddings --------------------------------------------------------

def rope_sin_cos(cfg: LlamaConfig, positions: jnp.ndarray):
    """positions (...,) → sin/cos (..., head_dim) in HF half-rotation layout
    (analog of the RoPE handling inside gptAttentionPlugin, reference:
    cpp/tensorrt_llm/plugins/gptAttentionCommon/)."""
    dh = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., dh/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.sin(emb), jnp.cos(emb)


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray):
    """x: (B, H, S, dh); sin/cos: (S, dh) — HF rotate_half convention —
    or pre-broadcast 4-D (e.g. (B, 1, 1, dh) for per-lane ragged steps)."""
    if sin.ndim == 2:
        sin, cos = sin[None, None], cos[None, None]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos + rotated * sin).astype(x.dtype)


# -- params -------------------------------------------------------------------

def _init_layer(rng, cfg: LlamaConfig) -> dict:
    d, dh = cfg.d_model, cfg.head_dim
    kv = cfg.n_kv_head * dh
    return {
        "input_norm": {"scale": np.ones((d,), np.float32)},
        "q": init_dense(rng, d, d, bias=False),
        "k": init_dense(rng, d, kv, bias=False),
        "v": init_dense(rng, d, kv, bias=False),
        "o": init_dense(rng, d, d, bias=False),
        "post_norm": {"scale": np.ones((d,), np.float32)},
        "gate": init_dense(rng, d, cfg.ffn_dim, bias=False),
        "up": init_dense(rng, d, cfg.ffn_dim, bias=False),
        "down": init_dense(rng, cfg.ffn_dim, d, bias=False),
    }


def init_params(cfg: LlamaConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    p = {
        "embed_tokens": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "norm": {"scale": np.ones((cfg.d_model,), np.float32)},
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = init_dense(rng, cfg.d_model, cfg.vocab_size, bias=False)
    return p


# -- forward ------------------------------------------------------------------

def _split(t, heads, dh):
    b, s, _ = t.shape
    return t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)


def _logits(params, cfg, x):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].astype(x.dtype)
        return jnp.einsum("bsd,vd->bsv", x, w, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "bsd,dv->bsv", x, params["lm_head"]["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def forward(params: dict, cfg: LlamaConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S) → logits (B, S, V) fp32."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tokens)
    sin, cos = rope_sin_cos(cfg, jnp.arange(s))

    def body(x, lp):
        h = rms_norm(lp["input_norm"], x, cfg.rms_eps)
        q = apply_rope(_split(dense(lp["q"], h), cfg.n_head, dh), sin, cos)
        k = apply_rope(_split(dense(lp["k"], h), cfg.n_kv_head, dh), sin, cos)
        v = _split(dense(lp["v"], h), cfg.n_kv_head, dh)
        a = mha(q * dh ** -0.5, k, v, causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + dense(lp["o"], a)
        h = rms_norm(lp["post_norm"], x, cfg.rms_eps)
        x = x + dense(lp["down"], jax.nn.silu(dense(lp["gate"], h)) * dense(lp["up"], h))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(params["norm"], x, cfg.rms_eps)
    return _logits(params, cfg, x)


def _step(params, cfg: LlamaConfig, tok, pos, cache_k, cache_v):
    """Generation phase. ``pos`` is a scalar (lockstep) or a (B,) vector
    (ragged/in-flight per-lane positions — per-lane RoPE angles, cache write
    offsets and valid lengths)."""
    b = tok.shape[0]
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tok[:, None])
    if getattr(pos, "ndim", 0) == 1:
        sin, cos = rope_sin_cos(cfg, pos)                    # (B, dh)
        sin, cos = sin[:, None, None], cos[:, None, None]    # (B, 1, 1, dh)
    else:
        sin, cos = rope_sin_cos(cfg, pos[None].astype(jnp.float32))

    def body(x, xs):
        lp, ck, cv = xs
        h = rms_norm(lp["input_norm"], x, cfg.rms_eps)
        q = apply_rope(_split(dense(lp["q"], h), cfg.n_head, dh), sin, cos)
        k = apply_rope(_split(dense(lp["k"], h), cfg.n_kv_head, dh), sin, cos)
        v = _split(dense(lp["v"], h), cfg.n_kv_head, dh)
        ck, cv = update_kv_cache(ck, cv, k, v, pos)
        rep = cfg.n_head // cfg.n_kv_head
        qk = q * dh ** -0.5
        a = mha_decode_step(
            qk,
            jnp.repeat(ck, rep, axis=1) if rep > 1 else ck,
            jnp.repeat(cv, rep, axis=1) if rep > 1 else cv,
            pos + 1,
        )
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = x + dense(lp["o"], a)
        h = rms_norm(lp["post_norm"], x, cfg.rms_eps)
        x = x + dense(lp["down"], jax.nn.silu(dense(lp["gate"], h)) * dense(lp["up"], h))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["layers"], cache_k, cache_v))
    x = rms_norm(params["norm"], x, cfg.rms_eps)
    return _logits(params, cfg, x)[:, 0], cache_k, cache_v


def _prefill(params, cfg: LlamaConfig, tokens, cache_k, cache_v):
    """Fused context phase: the whole prompt in one MXU-friendly pass,
    writing post-rope K and V into the static caches (the
    gptAttentionPlugin context phase; GQA caches store n_kv_head heads)."""
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens,
                                          cache_k, cache_v)
    return _logits(params, cfg, x[:, -1:])[:, 0], cache_k, cache_v


def _prefill_ragged(params, cfg: LlamaConfig, tokens, lens, cache_k, cache_v):
    """Ragged context phase: same graph as _prefill, logits gathered at each
    row's own last valid position (reference: tensorrt_llm/functional.py:3316)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens,
                                          cache_k, cache_v)
    last = gather_last_token_logits(x, lens)[:, None]    # (B, 1, d)
    return _logits(params, cfg, last)[:, 0], cache_k, cache_v


def _prefill_hidden(params, cfg: LlamaConfig, tokens, cache_k, cache_v):
    """Context phase returning final hidden states (B, S, d) — shared by the
    lockstep prefill (projects [:, -1]) and the ragged prefill (gathers each
    row's last valid position first); the vocab projection runs only on the
    gathered positions."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tokens)
    sin, cos = rope_sin_cos(cfg, jnp.arange(s))

    def body(x, xs):
        lp, ck, cv = xs
        h = rms_norm(lp["input_norm"], x, cfg.rms_eps)
        q = apply_rope(_split(dense(lp["q"], h), cfg.n_head, dh), sin, cos)
        k = apply_rope(_split(dense(lp["k"], h), cfg.n_kv_head, dh), sin, cos)
        v = _split(dense(lp["v"], h), cfg.n_kv_head, dh)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        a = mha(q * dh ** -0.5, k, v, causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + dense(lp["o"], a)
        h = rms_norm(lp["post_norm"], x, cfg.rms_eps)
        x = x + dense(lp["down"], jax.nn.silu(dense(lp["gate"], h)) * dense(lp["up"], h))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    return rms_norm(params["norm"], x, cfg.rms_eps), cache_k, cache_v


@functools.lru_cache(maxsize=8)
def _compiled_generate_ragged(cfg: LlamaConfig, prompt_pad: int,
                              max_new_tokens: int, sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt, lens):
        b = prompt.shape[0]
        max_len = prompt_pad + max_new_tokens
        return causal_lm.generate_tokens_ragged(
            lambda p, t, l, ck, cv: _prefill_ragged(p, cfg, t, l, ck, cv),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt, lens,
            cache_shape=(cfg.n_layer, b, cfg.n_kv_head, max_len, cfg.head_dim),
            max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate_ragged(params: dict, cfg: LlamaConfig, prompt: jnp.ndarray,
                    prompt_lens, max_new_tokens: int,
                    temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 0.0, repetition_penalty: float = 1.0,
                    seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """Variable-length batched generation (per-row input lengths) — see
    models/gpt/model.py::generate_ragged."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
    return _compiled_generate_ragged(
        cfg, prompt.shape[1], max_new_tokens, sc)(params, prompt, prompt_lens)


@functools.lru_cache(maxsize=8)
def _compiled_generate(cfg: LlamaConfig, prompt_len: int, max_len: int,
                       sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt):
        b = prompt.shape[0]
        return causal_lm.generate_tokens(
            lambda p, t, ck, cv: _prefill(p, cfg, t, ck, cv),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_kv_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_len=max_len,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate(params: dict, cfg: LlamaConfig, prompt: jnp.ndarray,
             max_new_tokens: int, temperature: float = 1.0, top_k: int = 0,
             top_p: float = 0.0, repetition_penalty: float = 1.0,
             seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """KV-cached generation through the shared causal-LM runtime (fused
    context phase + one-token generation phase, the reference's
    GenerationSession pattern)."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    prompt_len = prompt.shape[1]
    max_len = min(cfg.max_positions, prompt_len + max_new_tokens)
    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    return _compiled_generate(cfg, prompt_len, max_len, sc)(params, prompt)


@functools.lru_cache(maxsize=8)
def _compiled_generate_beam(cfg: LlamaConfig, prompt_len: int,
                            max_new_tokens: int, num_beams: int,
                            length_penalty: float):
    from whisper_trtllm_tpu.runtime import beam_lm

    def fn(params, prompt):
        b = prompt.shape[0]
        max_len = prompt_len + max_new_tokens
        return beam_lm.beam_generate_tokens(
            lambda p, t, ck, cv: _prefill(p, cfg, t, ck, cv),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_kv_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, num_beams=num_beams,
            length_penalty=length_penalty,
        )

    return jax.jit(fn)


def generate_beam(params: dict, cfg: LlamaConfig, prompt: jnp.ndarray,
                  max_new_tokens: int, num_beams: int,
                  length_penalty: float = 1.0):
    """Beam search (HF early_stopping=True semantics) — see
    models/gpt/model.py::generate_beam; per-beam RoPE positions come for
    free (the step contract's scalar pos is shared across beams)."""
    if prompt.shape[1] + max_new_tokens > cfg.max_positions:
        raise ValueError("prompt_len + max_new_tokens exceeds max_positions")
    return _compiled_generate_beam(
        cfg, prompt.shape[1], max_new_tokens, num_beams, length_penalty,
    )(params, prompt)


# -- HF conversion --------------------------------------------------------------

def convert_hf_llama(hf_model) -> Tuple[dict, LlamaConfig]:
    hc = hf_model.config
    cfg = LlamaConfig(
        vocab_size=hc.vocab_size, max_positions=hc.max_position_embeddings,
        d_model=hc.hidden_size, n_layer=hc.num_hidden_layers,
        n_head=hc.num_attention_heads,
        n_kv_head=getattr(hc, "num_key_value_heads", hc.num_attention_heads),
        ffn_dim=hc.intermediate_size, rms_eps=hc.rms_norm_eps,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        eos_token_id=hc.eos_token_id or 2,
        tie_word_embeddings=getattr(hc, "tie_word_embeddings", False),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def lin(p):
        return {"kernel": np.ascontiguousarray(sd[p + ".weight"].T)}

    layers = []
    for i in range(cfg.n_layer):
        p = f"model.layers.{i}"
        layers.append({
            "input_norm": {"scale": sd[p + ".input_layernorm.weight"]},
            "q": lin(p + ".self_attn.q_proj"),
            "k": lin(p + ".self_attn.k_proj"),
            "v": lin(p + ".self_attn.v_proj"),
            "o": lin(p + ".self_attn.o_proj"),
            "post_norm": {"scale": sd[p + ".post_attention_layernorm.weight"]},
            "gate": lin(p + ".mlp.gate_proj"),
            "up": lin(p + ".mlp.up_proj"),
            "down": lin(p + ".mlp.down_proj"),
        })
    params = {
        "embed_tokens": sd["model.embed_tokens.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "norm": {"scale": sd["model.norm.weight"]},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": np.ascontiguousarray(sd["lm_head.weight"].T)}
    return params, cfg
