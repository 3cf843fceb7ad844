"""GPT-NeoX decoder-only model (zoo breadth).

Analog of the reference's GPT-NeoX family (reference:
tensorrt_llm/models/gptneox/model.py): NeoX-style partial rotary embeddings
(half-rotation convention, applied to the first ``rotary_dim`` dims), a
fused query_key_value projection stored per-head-interleaved in HF
checkpoints, dual LayerNorms per block, and the ``use_parallel_residual``
switch between parallel (x + attn(ln1 x) + mlp(ln2 x)) and sequential
residual forms. Converts from HF GPTNeoXForCausalLM for parity tests.
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
from whisper_trtllm_tpu.models.llama.model import apply_rope
from whisper_trtllm_tpu.ops.attention import mha
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm


@dataclass(frozen=True)
class GPTNeoXConfig:
    vocab_size: int = 50432
    max_positions: int = 2048
    d_model: int = 6144
    n_layer: int = 44
    n_head: int = 64
    rotary_pct: float = 0.25
    rope_theta: float = 10000.0
    ffn_dim: int = 24576
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    eos_token_id: int = 0

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.rotary_pct)

    @classmethod
    def testing(cls, **overrides) -> "GPTNeoXConfig":
        kw = dict(vocab_size=89, max_positions=32, d_model=32, n_layer=2,
                  n_head=4, ffn_dim=64, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def neox_rope_sin_cos(cfg: GPTNeoXConfig, positions: jnp.ndarray):
    """positions (S,) → sin/cos (S, rotary_dim) in the half-rotation layout
    (the neox_rotary_style=True path of the reference's gptAttentionPlugin;
    same convention as LLaMA but over rotary_dim < head_dim dims)."""
    rd = cfg.rotary_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd)
    )
    angles = positions.astype(jnp.float32)[:, None] * inv_freq  # (S, rd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)            # (S, rd)
    return jnp.sin(emb), jnp.cos(emb)


def apply_partial_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray,
                       rotary_dim: int):
    """x: (B, H, S, dh); rotate the first rotary_dim dims, tail passes
    through unchanged."""
    rot, tail = x[..., :rotary_dim], x[..., rotary_dim:]
    return jnp.concatenate([apply_rope(rot, sin, cos), tail], axis=-1)


def _init_layer(rng, cfg: GPTNeoXConfig) -> dict:
    d = cfg.d_model
    return {
        "input_ln": init_layer_norm(d),
        "q": init_dense(rng, d, d),
        "k": init_dense(rng, d, d),
        "v": init_dense(rng, d, d),
        "attn_out": init_dense(rng, d, d),
        "post_attn_ln": init_layer_norm(d),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
    }


def init_params(cfg: GPTNeoXConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "embed_in": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": init_layer_norm(cfg.d_model),
        "embed_out": init_dense(rng, cfg.d_model, cfg.vocab_size, bias=False),
    }


def forward(params: dict, cfg: GPTNeoXConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S) → logits (B, S, V) fp32."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["embed_in"], tokens)
    sin, cos = neox_rope_sin_cos(cfg, jnp.arange(s))

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, lp):
        h = layer_norm(lp["input_ln"], x, eps=cfg.layer_norm_eps)
        q = apply_partial_rope(heads(dense(lp["q"], h)), sin, cos, cfg.rotary_dim)
        k = apply_partial_rope(heads(dense(lp["k"], h)), sin, cos, cfg.rotary_dim)
        a = mha(q * dh ** -0.5, k, heads(dense(lp["v"], h)), causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        attn_out = dense(lp["attn_out"], a)
        if cfg.use_parallel_residual:
            h2 = layer_norm(lp["post_attn_ln"], x, eps=cfg.layer_norm_eps)
            ffn = dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h2)))
            return x + attn_out + ffn, None
        x = x + attn_out
        h2 = layer_norm(lp["post_attn_ln"], x, eps=cfg.layer_norm_eps)
        x = x + dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h2)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)
    return dense(params["embed_out"], x).astype(jnp.float32)


def convert_hf_gptneox(hf_model) -> Tuple[dict, GPTNeoXConfig]:
    """transformers GPTNeoXForCausalLM → (params, config).

    HF stores query_key_value fused per-head-interleaved:
    weight (3·d, d) viewed as (heads, 3, dh, d) — the same layout the
    reference unfuses in its checkpoint converter
    (reference: examples/gptneox weight loading)."""
    hc = hf_model.config
    cfg = GPTNeoXConfig(
        vocab_size=hc.vocab_size, max_positions=hc.max_position_embeddings,
        d_model=hc.hidden_size, n_layer=hc.num_hidden_layers,
        n_head=hc.num_attention_heads, rotary_pct=hc.rotary_pct,
        rope_theta=hc.rotary_emb_base, ffn_dim=hc.intermediate_size,
        activation=hc.hidden_act, layer_norm_eps=hc.layer_norm_eps,
        use_parallel_residual=hc.use_parallel_residual,
        eos_token_id=hc.eos_token_id if hc.eos_token_id is not None else 0,
    )
    d, h, dh = cfg.d_model, cfg.n_head, cfg.head_dim
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def lin(p, bias=True):
        out = {"kernel": np.ascontiguousarray(sd[p + ".weight"].T)}
        if bias:
            out["bias"] = sd[p + ".bias"]
        return out

    layers = []
    for i in range(cfg.n_layer):
        p = f"gpt_neox.layers.{i}"
        qkv_w = sd[p + ".attention.query_key_value.weight"].reshape(h, 3, dh, d)
        qkv_b = sd[p + ".attention.query_key_value.bias"].reshape(h, 3, dh)

        def proj(j):
            return {
                "kernel": np.ascontiguousarray(
                    qkv_w[:, j].reshape(d, d).T),
                "bias": qkv_b[:, j].reshape(d),
            }

        layers.append({
            "input_ln": ln(p + ".input_layernorm"),
            "q": proj(0),
            "k": proj(1),
            "v": proj(2),
            "attn_out": lin(p + ".attention.dense"),
            "post_attn_ln": ln(p + ".post_attention_layernorm"),
            "fc_in": lin(p + ".mlp.dense_h_to_4h"),
            "fc_out": lin(p + ".mlp.dense_4h_to_h"),
        })
    params = {
        "embed_in": sd["gpt_neox.embed_in.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": ln("gpt_neox.final_layer_norm"),
        "embed_out": lin("embed_out", bias=False),
    }
    return params, cfg


def _block(lp, cfg: GPTNeoXConfig, x, sin, cos, attend):
    """One block (parallel or sequential residual); ``attend(q, k, v)``
    supplies the attention (full causal in prefill, cached step in
    generation)."""
    b, s, _ = x.shape
    dh = cfg.head_dim

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    h = layer_norm(lp["input_ln"], x, eps=cfg.layer_norm_eps)
    q = apply_partial_rope(heads(dense(lp["q"], h)), sin, cos, cfg.rotary_dim)
    k = apply_partial_rope(heads(dense(lp["k"], h)), sin, cos, cfg.rotary_dim)
    a = attend(q * dh ** -0.5, k, heads(dense(lp["v"], h)))
    a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
    attn_out = dense(lp["attn_out"], a)
    if cfg.use_parallel_residual:
        h2 = layer_norm(lp["post_attn_ln"], x, eps=cfg.layer_norm_eps)
        ffn = dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h2)))
        return x + attn_out + ffn
    x = x + attn_out
    h2 = layer_norm(lp["post_attn_ln"], x, eps=cfg.layer_norm_eps)
    return x + dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h2)))


def _prefill_hidden(params, cfg: GPTNeoXConfig, tokens, cache_k, cache_v):
    """Context phase with cache write; returns final hidden states (B, S, d)
    — shared by the lockstep prefill (projects [:, -1]) and the ragged
    prefill (gathers each row's last valid position first)."""
    from whisper_trtllm_tpu.ops.attention import mha as _mha

    s = tokens.shape[1]
    x = embedding(params["embed_in"], tokens)
    sin, cos = neox_rope_sin_cos(cfg, jnp.arange(s))

    def body(x, xs):
        lp, ck, cv = xs
        holder = {}

        def attend(q, k, v):
            holder["kv"] = (k, v)
            return _mha(q, k, v, causal=True)

        x = _block(lp, cfg, x, sin, cos, attend)
        k, v = holder["kv"]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["layers"], cache_k, cache_v))
    return layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps), \
        cache_k, cache_v


def _prefill(params, cfg: GPTNeoXConfig, tokens, cache_k, cache_v):
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return dense(params["embed_out"], x[:, -1]).astype(jnp.float32), \
        cache_k, cache_v


def _prefill_ragged(params, cfg: GPTNeoXConfig, tokens, lens,
                    cache_k, cache_v):
    """Ragged context phase: logits at each row's own last valid position
    (reference: tensorrt_llm/functional.py:3316 gather_last_token_logits)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    last = gather_last_token_logits(x, lens)
    return dense(params["embed_out"], last).astype(jnp.float32), \
        cache_k, cache_v


def _step(params, cfg: GPTNeoXConfig, tok, pos, cache_k, cache_v):
    from whisper_trtllm_tpu.ops.attention import mha_decode_step, update_kv_cache

    x = embedding(params["embed_in"], tok[:, None])
    if getattr(pos, "ndim", 0) == 1:
        sin, cos = neox_rope_sin_cos(cfg, pos)           # (B, rd)
        sin, cos = sin[:, None, None], cos[:, None, None]
    else:
        sin, cos = neox_rope_sin_cos(cfg, pos[None])

    def body(x, xs):
        lp, ck, cv = xs
        holder = {}

        def attend(q, k, v):
            nck, ncv = update_kv_cache(ck, cv, k, v, pos)
            holder["kv"] = (nck, ncv)
            return mha_decode_step(q, nck, ncv, pos + 1)

        x = _block(lp, cfg, x, sin, cos, attend)
        return x, holder["kv"]

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["layers"], cache_k, cache_v))
    x = layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)
    logits = dense(params["embed_out"], x[:, 0]).astype(jnp.float32)
    return logits, cache_k, cache_v


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: GPTNeoXConfig, prompt_pad: int,
                              max_new_tokens: int, sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt, lens):
        b = prompt.shape[0]
        max_len = prompt_pad + max_new_tokens
        return causal_lm.generate_tokens_ragged(
            lambda p, t, l, ck, cv: _prefill_ragged(p, cfg, t, l, ck, cv),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt, lens,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate_ragged(params: dict, cfg: GPTNeoXConfig, prompt: jnp.ndarray,
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


@functools.lru_cache(maxsize=16)
def _compiled_generate(cfg: GPTNeoXConfig, prompt_len: int, max_len: int,
                       sampling_cfg=None):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt):
        b = prompt.shape[0]
        return causal_lm.generate_tokens(
            lambda p, t, ck, cv: _prefill(p, cfg, t, ck, cv),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_len=max_len,
            eos_token_id=cfg.eos_token_id, sampling_cfg=sampling_cfg,
        )

    return jax.jit(fn)


def generate(params: dict, cfg: GPTNeoXConfig, prompt: jnp.ndarray,
             max_new_tokens: int, temperature: float = 1.0, top_k: int = 0,
             top_p: float = 0.0, repetition_penalty: float = 1.0,
             seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """KV-cached generation through the shared causal-LM runtime."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    prompt_len = prompt.shape[1]
    max_len = min(cfg.max_positions, prompt_len + max_new_tokens)
    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    return _compiled_generate(cfg, prompt_len, max_len, sc)(params, prompt)


# beam search via the model-agnostic factory — HF generate(num_beams=K,
# early_stopping=True) semantics (the reference enables beam_width>1 for
# every engine through one GenerationSession, reference:
# tensorrt_llm/runtime/generation.py:898-975)
from whisper_trtllm_tpu.runtime.beam_lm import make_generate_beam

generate_beam = make_generate_beam(_prefill, _step)
