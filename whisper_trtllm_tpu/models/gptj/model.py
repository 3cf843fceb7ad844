"""GPT-J decoder-only model (zoo breadth).

Analog of the reference's GPT-J family (reference:
tensorrt_llm/models/gptj/model.py): partial rotary embeddings in GPT-J's
interleaved ("rotate every two") convention over the first ``rotary_dim``
dims, a *parallel* residual block — attention and MLP both read the same
``ln_1`` output and add into the residual together — bias-free attention
projections, and an untied ``lm_head`` with bias. Same scanned-layer
machinery as the other zoo models; converts from HF GPTJForCausalLM for
parity tests.
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
from whisper_trtllm_tpu.ops.attention import mha
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm


@dataclass(frozen=True)
class GPTJConfig:
    vocab_size: int = 50400
    max_positions: int = 2048
    d_model: int = 4096
    n_layer: int = 28
    n_head: int = 16
    rotary_dim: int = 64
    ffn_dim: int = 16384
    activation: str = "gelu_new"
    eos_token_id: int = 50256

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "GPTJConfig":
        kw = dict(vocab_size=89, max_positions=32, d_model=32, n_layer=2,
                  n_head=4, rotary_dim=4, ffn_dim=64, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def rope_interleaved_sin_cos(rotary_dim: int, positions: jnp.ndarray):
    """positions (S,) → sin/cos (S, rotary_dim), each angle repeated twice
    (GPT-J convention; the neox_rotary_style=False path of the reference's
    gptAttentionPlugin, reference: tensorrt_llm/models/gptj/model.py:33)."""
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    angles = positions.astype(jnp.float32)[:, None] * inv_freq  # (S, rd/2)
    angles = jnp.repeat(angles, 2, axis=-1)                     # (S, rd)
    return jnp.sin(angles), jnp.cos(angles)


def apply_rope_interleaved(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray,
                           rotary_dim: int):
    """x: (B, H, S, dh); rotate the first rotary_dim dims in pairs
    (x[2i], x[2i+1]), pass the tail through unchanged."""
    if sin.ndim == 2:
        sin, cos = sin[None, None], cos[None, None]
    rot, tail = x[..., :rotary_dim], x[..., rotary_dim:]
    x1, x2 = rot[..., 0::2], rot[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(rot.shape)
    rot = rot * cos + rotated * sin
    return jnp.concatenate([rot.astype(x.dtype), tail], axis=-1)


def _init_layer(rng, cfg: GPTJConfig) -> dict:
    d = cfg.d_model
    return {
        "ln_1": init_layer_norm(d),
        "q": init_dense(rng, d, d, bias=False),
        "k": init_dense(rng, d, d, bias=False),
        "v": init_dense(rng, d, d, bias=False),
        "attn_out": init_dense(rng, d, d, bias=False),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
    }


def init_params(cfg: GPTJConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "wte": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": init_layer_norm(cfg.d_model),
        "lm_head": init_dense(rng, cfg.d_model, cfg.vocab_size),
    }


def forward(params: dict, cfg: GPTJConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S) → logits (B, S, V) fp32."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["wte"], tokens)
    sin, cos = rope_interleaved_sin_cos(cfg.rotary_dim, jnp.arange(s))

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, lp):
        h = layer_norm(lp["ln_1"], x)
        q = apply_rope_interleaved(heads(dense(lp["q"], h)), sin, cos,
                                   cfg.rotary_dim)
        k = apply_rope_interleaved(heads(dense(lp["k"], h)), sin, cos,
                                   cfg.rotary_dim)
        a = mha(q * dh ** -0.5, k, heads(dense(lp["v"], h)), causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        ffn = dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x + dense(lp["attn_out"], a) + ffn, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["ln_f"], x)
    return dense(params["lm_head"], x).astype(jnp.float32)


def convert_hf_gptj(hf_model) -> Tuple[dict, GPTJConfig]:
    """transformers GPTJForCausalLM → (params, config)."""
    hc = hf_model.config
    cfg = GPTJConfig(
        vocab_size=hc.vocab_size, max_positions=hc.n_positions,
        d_model=hc.n_embd, n_layer=hc.n_layer, n_head=hc.n_head,
        rotary_dim=hc.rotary_dim, ffn_dim=hc.n_inner or 4 * hc.n_embd,
        activation=hc.activation_function, eos_token_id=hc.eos_token_id,
    )
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
        p = f"transformer.h.{i}"
        layers.append({
            "ln_1": ln(p + ".ln_1"),
            "q": lin(p + ".attn.q_proj", bias=False),
            "k": lin(p + ".attn.k_proj", bias=False),
            "v": lin(p + ".attn.v_proj", bias=False),
            "attn_out": lin(p + ".attn.out_proj", bias=False),
            "fc_in": lin(p + ".mlp.fc_in"),
            "fc_out": lin(p + ".mlp.fc_out"),
        })
    params = {
        "wte": sd["transformer.wte.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": ln("transformer.ln_f"),
        "lm_head": lin("lm_head"),
    }
    return params, cfg


def _block(lp, cfg: GPTJConfig, x, sin, cos, attend):
    """One parallel-residual block; ``attend(q, k, v)`` supplies the
    attention (full causal in prefill, cached step in generation)."""
    b, s, _ = x.shape
    dh = cfg.head_dim

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    h = layer_norm(lp["ln_1"], x)
    q = apply_rope_interleaved(heads(dense(lp["q"], h)), sin, cos,
                               cfg.rotary_dim)
    k = apply_rope_interleaved(heads(dense(lp["k"], h)), sin, cos,
                               cfg.rotary_dim)
    a = attend(q * dh ** -0.5, k, heads(dense(lp["v"], h)))
    a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
    ffn = dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
    return x + dense(lp["attn_out"], a) + ffn


def _prefill_hidden(params, cfg: GPTJConfig, tokens, cache_k, cache_v):
    """Context phase with cache write; returns final hidden states (B, S, d)
    — shared by the lockstep prefill (projects [:, -1]) and the ragged
    prefill (gathers each row's last valid position first)."""
    from whisper_trtllm_tpu.ops.attention import mha as _mha

    s = tokens.shape[1]
    x = embedding(params["wte"], tokens)
    sin, cos = rope_interleaved_sin_cos(cfg.rotary_dim, jnp.arange(s))

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
    return layer_norm(params["ln_f"], x), cache_k, cache_v


def _prefill(params, cfg: GPTJConfig, tokens, cache_k, cache_v):
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return dense(params["lm_head"], x[:, -1]).astype(jnp.float32), \
        cache_k, cache_v


def _prefill_ragged(params, cfg: GPTJConfig, tokens, lens, cache_k, cache_v):
    """Ragged context phase: logits at each row's own last valid position
    (reference: tensorrt_llm/functional.py:3316 gather_last_token_logits)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    last = gather_last_token_logits(x, lens)
    return dense(params["lm_head"], last).astype(jnp.float32), \
        cache_k, cache_v


def _step(params, cfg: GPTJConfig, tok, pos, cache_k, cache_v):
    from whisper_trtllm_tpu.ops.attention import mha_decode_step, update_kv_cache

    x = embedding(params["wte"], tok[:, None])
    if getattr(pos, "ndim", 0) == 1:
        sin, cos = rope_interleaved_sin_cos(cfg.rotary_dim, pos)  # (B, rd)
        sin, cos = sin[:, None, None], cos[:, None, None]
    else:
        sin, cos = rope_interleaved_sin_cos(cfg.rotary_dim, pos[None])

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
    x = layer_norm(params["ln_f"], x)
    logits = dense(params["lm_head"], x[:, 0]).astype(jnp.float32)
    return logits, cache_k, cache_v


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: GPTJConfig, prompt_pad: int,
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


def generate_ragged(params: dict, cfg: GPTJConfig, prompt: jnp.ndarray,
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
def _compiled_generate(cfg: GPTJConfig, prompt_len: int, max_len: int,
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


def generate(params: dict, cfg: GPTJConfig, prompt: jnp.ndarray,
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
