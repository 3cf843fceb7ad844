"""Bloom-family decoder-only model (zoo breadth): ALiBi positions, embedding
LayerNorm, per-head-interleaved fused QKV.

Analog of the reference's Bloom family (reference:
tensorrt_llm/models/bloom/model.py, using the alibi graph op,
tensorrt_llm/functional.py:3222-3283). No positional embedding table —
the additive ALiBi bias inside attention carries position information.
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
from whisper_trtllm_tpu.ops.attention import mha, mha_decode_step, update_kv_cache
from whisper_trtllm_tpu.ops.functional import alibi_bias, dense, embedding, gelu, layer_norm


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    d_model: int = 1024
    n_layer: int = 24
    n_head: int = 16
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "BloomConfig":
        kw = dict(vocab_size=89, d_model=32, n_layer=2, n_head=4,
                  eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _init_layer(rng, cfg: BloomConfig) -> dict:
    d = cfg.d_model
    return {
        "input_ln": init_layer_norm(d),
        "q": init_dense(rng, d, d),
        "k": init_dense(rng, d, d),
        "v": init_dense(rng, d, d),
        "attn_out": init_dense(rng, d, d),
        "post_ln": init_layer_norm(d),
        "fc_in": init_dense(rng, d, 4 * d),
        "fc_out": init_dense(rng, 4 * d, d),
    }


def init_params(cfg: BloomConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "word_embeddings": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "embed_ln": init_layer_norm(cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": init_layer_norm(cfg.d_model),
    }


def forward(params: dict, cfg: BloomConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S) → logits (B, S, V) fp32."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["word_embeddings"], tokens)
    x = layer_norm(params["embed_ln"], x, cfg.layer_norm_eps)
    # ALiBi replaces positional embeddings (additive bias on scores)
    bias = alibi_bias(cfg.n_head, s)                    # (1, H, 1, S)

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, lp):
        h = layer_norm(lp["input_ln"], x, cfg.layer_norm_eps)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        a = mha(q, heads(dense(lp["k"], h)), heads(dense(lp["v"], h)),
                mask=bias, causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x, cfg.layer_norm_eps)
        x = x + dense(lp["fc_out"], gelu(dense(lp["fc_in"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    return jnp.einsum(
        "bsd,vd->bsv", x, params["word_embeddings"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def _prefill_hidden(params, cfg: BloomConfig, tokens, cache_k, cache_v):
    """Context phase with cache write and ALiBi bias (the reference's
    gptAttentionPlugin context phase with alibi, reference:
    tensorrt_llm/layers/attention.py); returns final hidden states (B, S, d)
    — shared by the lockstep prefill (projects [:, -1]) and the ragged
    prefill (gathers each row's last valid position first)."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["word_embeddings"], tokens)
    x = layer_norm(params["embed_ln"], x, cfg.layer_norm_eps)
    bias = alibi_bias(cfg.n_head, s)

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["input_ln"], x, cfg.layer_norm_eps)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        k = heads(dense(lp["k"], h))
        v = heads(dense(lp["v"], h))
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        a = mha(q, k, v, mask=bias, causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x, cfg.layer_norm_eps)
        x = x + dense(lp["fc_out"], gelu(dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    return layer_norm(params["ln_f"], x, cfg.layer_norm_eps), cache_k, cache_v


def _vocab_logits(params, x):
    return jnp.einsum(
        "bd,vd->bv", x, params["word_embeddings"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def _prefill(params, cfg: BloomConfig, tokens, cache_k, cache_v):
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return _vocab_logits(params, x[:, -1]), cache_k, cache_v


def _prefill_ragged(params, cfg: BloomConfig, tokens, lens, cache_k, cache_v):
    """Ragged context phase: logits at each row's own last valid position
    (reference: tensorrt_llm/functional.py:3316 gather_last_token_logits)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return _vocab_logits(params, gather_last_token_logits(x, lens)), \
        cache_k, cache_v


def _step(params, cfg: BloomConfig, tok, pos, cache_k, cache_v):
    """Generation phase: one token for the whole batch. ALiBi needs no
    per-step position input — the bias depends only on key positions (the
    softmax is shift-invariant in the query term), so one constant
    (1, H, 1, Tmax) bias serves every step; ``pos`` may be a scalar
    (lockstep) or a (B,) vector (ragged per-lane offsets)."""
    b = tok.shape[0]
    dh = cfg.head_dim
    x = embedding(params["word_embeddings"], tok[:, None])
    x = layer_norm(params["embed_ln"], x, cfg.layer_norm_eps)
    bias = alibi_bias(cfg.n_head, cache_k.shape[3])     # (1, H, 1, Tmax)

    def heads(t):
        return t.reshape(b, 1, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["input_ln"], x, cfg.layer_norm_eps)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        ck, cv = update_kv_cache(
            ck, cv, heads(dense(lp["k"], h)), heads(dense(lp["v"], h)), pos
        )
        a = mha_decode_step(q, ck, cv, pos + 1, bias=bias)
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        h = layer_norm(lp["post_ln"], x, cfg.layer_norm_eps)
        x = x + dense(lp["fc_out"], gelu(dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    logits = jnp.einsum(
        "bd,vd->bv", x[:, 0], params["word_embeddings"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, cache_k, cache_v


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: BloomConfig, prompt_pad: int,
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


def generate_ragged(params: dict, cfg: BloomConfig, prompt: jnp.ndarray,
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
def _compiled_generate(cfg: BloomConfig, prompt_len: int, max_len: int,
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


def generate(params: dict, cfg: BloomConfig, prompt: jnp.ndarray,
             max_new_tokens: int, temperature: float = 1.0, top_k: int = 0,
             top_p: float = 0.0, repetition_penalty: float = 1.0,
             seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """Cached generation via the shared causal-LM loop (the reference runs
    Bloom through the same GenerationSession as GPT, reference:
    examples/bloom/run.py → tensorrt_llm/runtime/generation.py:151)."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    prompt_len = prompt.shape[1]
    max_len = prompt_len + max_new_tokens
    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    return _compiled_generate(cfg, prompt_len, max_len, sc)(params, prompt)


def convert_hf_bloom(hf_model) -> Tuple[dict, BloomConfig]:
    """transformers BloomForCausalLM → (params, config). Bloom's fused QKV
    is per-head interleaved: weight (3d, d) viewed as (H, 3, dh, d) — split
    into separate q/k/v kernels at conversion (the reference reorders the
    same layout when binding weights)."""
    hc = hf_model.config
    cfg = BloomConfig(
        vocab_size=hc.vocab_size, d_model=hc.hidden_size,
        n_layer=hc.n_layer, n_head=hc.n_head,
        layer_norm_eps=hc.layer_norm_epsilon,
        eos_token_id=hc.eos_token_id if hc.eos_token_id is not None else 2,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    d, h, dh = cfg.d_model, cfg.n_head, cfg.head_dim

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def lin(p):
        return {"kernel": np.ascontiguousarray(sd[p + ".weight"].T),
                "bias": sd[p + ".bias"]}

    layers = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        qkv_w = sd[p + ".self_attention.query_key_value.weight"]  # (3d, d)
        qkv_b = sd[p + ".self_attention.query_key_value.bias"]    # (3d,)
        w = qkv_w.reshape(h, 3, dh, d)
        bvec = qkv_b.reshape(h, 3, dh)

        def proj(j):
            # (H, dh, d) → kernel (d_in, d_out=H*dh)
            kernel = w[:, j].reshape(h * dh, d).T
            return {"kernel": np.ascontiguousarray(kernel),
                    "bias": bvec[:, j].reshape(h * dh)}

        layers.append({
            "input_ln": ln(p + ".input_layernorm"),
            "q": proj(0), "k": proj(1), "v": proj(2),
            "attn_out": lin(p + ".self_attention.dense"),
            "post_ln": ln(p + ".post_attention_layernorm"),
            "fc_in": lin(p + ".mlp.dense_h_to_4h"),
            "fc_out": lin(p + ".mlp.dense_4h_to_h"),
        })
    params = {
        "word_embeddings": sd["transformer.word_embeddings.weight"],
        "embed_ln": ln("transformer.word_embeddings_layernorm"),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": ln("transformer.ln_f"),
    }
    return params, cfg


# beam search via the model-agnostic factory — HF generate(num_beams=K,
# early_stopping=True) semantics (the reference enables beam_width>1 for
# every engine through one GenerationSession, reference:
# tensorrt_llm/runtime/generation.py:898-975)
from whisper_trtllm_tpu.runtime.beam_lm import make_generate_beam

generate_beam = make_generate_beam(_prefill, _step)
