"""OPT-family decoder-only model (zoo breadth).

Analog of the reference's OPT family (reference:
tensorrt_llm/models/opt/model.py): learned positional embeddings with OPT's
+2 offset, ReLU MLP, pre-LN ("do_layer_norm_before") blocks with a final LN,
tied vocab head. Same scanned-layer machinery as the other zoo models;
converts from HF OPTForCausalLM for parity tests.
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
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm

_POS_OFFSET = 2  # OPT reserves the first two positional rows


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    max_positions: int = 2048
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    ffn_dim: int = 3072
    activation: str = "relu"
    eos_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "OPTConfig":
        kw = dict(vocab_size=89, max_positions=32, d_model=32, n_layer=2,
                  n_head=4, ffn_dim=64, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _init_layer(rng, cfg: OPTConfig) -> dict:
    d = cfg.d_model
    return {
        "attn_ln": init_layer_norm(d),
        "q": init_dense(rng, d, d),
        "k": init_dense(rng, d, d),
        "v": init_dense(rng, d, d),
        "attn_out": init_dense(rng, d, d),
        "ffn_ln": init_layer_norm(d),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
    }


def init_params(cfg: OPTConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "embed_tokens": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "embed_positions": init_embedding(
            rng, cfg.max_positions + _POS_OFFSET, cfg.d_model
        ),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": init_layer_norm(cfg.d_model),
    }


def forward(params: dict, cfg: OPTConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced: tokens (B, S) → logits (B, S, V) fp32."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tokens)
    x = x + params["embed_positions"][_POS_OFFSET : _POS_OFFSET + s][None]

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, lp):
        h = layer_norm(lp["attn_ln"], x)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        a = mha(q, heads(dense(lp["k"], h)), heads(dense(lp["v"], h)),
                causal=True)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        h = layer_norm(lp["ffn_ln"], x)
        x = x + dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["final_ln"], x)
    return jnp.einsum(
        "bsd,vd->bsv", x, params["embed_tokens"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def convert_hf_opt(hf_model) -> Tuple[dict, OPTConfig]:
    """transformers OPTForCausalLM → (params, config)."""
    hc = hf_model.config
    cfg = OPTConfig(
        vocab_size=hc.vocab_size, max_positions=hc.max_position_embeddings,
        d_model=hc.hidden_size, n_layer=hc.num_hidden_layers,
        n_head=hc.num_attention_heads, ffn_dim=hc.ffn_dim,
        activation=hc.activation_function,
        eos_token_id=hc.eos_token_id if hc.eos_token_id is not None else 2,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def lin(p):
        return {"kernel": np.ascontiguousarray(sd[p + ".weight"].T),
                "bias": sd[p + ".bias"]}

    layers = []
    for i in range(cfg.n_layer):
        p = f"model.decoder.layers.{i}"
        layers.append({
            "attn_ln": ln(p + ".self_attn_layer_norm"),
            "q": lin(p + ".self_attn.q_proj"),
            "k": lin(p + ".self_attn.k_proj"),
            "v": lin(p + ".self_attn.v_proj"),
            "attn_out": lin(p + ".self_attn.out_proj"),
            "ffn_ln": ln(p + ".final_layer_norm"),
            "fc_in": lin(p + ".fc1"),
            "fc_out": lin(p + ".fc2"),
        })
    params = {
        "embed_tokens": sd["model.decoder.embed_tokens.weight"],
        "embed_positions": sd["model.decoder.embed_positions.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": ln("model.decoder.final_layer_norm"),
    }
    return params, cfg


def _prefill_hidden(params, cfg: OPTConfig, tokens, cache_k, cache_v):
    """Context phase with cache write; returns final hidden states (B, S, d)
    — shared by the lockstep prefill (projects [:, -1]) and the ragged
    prefill (gathers each row's last valid position first)."""
    b, s = tokens.shape
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tokens)
    x = x + params["embed_positions"][_POS_OFFSET : _POS_OFFSET + s][None]

    def heads(t):
        return t.reshape(b, s, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["attn_ln"], x)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        k, v = heads(dense(lp["k"], h)), heads(dense(lp["v"], h))
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        a = mha(q, k, v, causal=True)
        x = x + dense(lp["attn_out"],
                      a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model))
        h = layer_norm(lp["ffn_ln"], x)
        x = x + dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["layers"], cache_k, cache_v))
    return layer_norm(params["final_ln"], x), cache_k, cache_v


def _vocab_logits(params, x):
    return jnp.einsum("bd,vd->bv", x, params["embed_tokens"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


def _prefill(params, cfg: OPTConfig, tokens, cache_k, cache_v):
    """Context phase (the shared causal-LM runtime's contract,
    runtime/causal_lm.py)."""
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return _vocab_logits(params, x[:, -1]), cache_k, cache_v


def _prefill_ragged(params, cfg: OPTConfig, tokens, lens, cache_k, cache_v):
    """Ragged context phase: logits at each row's own last valid position
    (reference: tensorrt_llm/functional.py:3316 gather_last_token_logits)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return _vocab_logits(params, gather_last_token_logits(x, lens)), \
        cache_k, cache_v


def _step(params, cfg: OPTConfig, tok, pos, cache_k, cache_v):
    """Generation phase: one token, cache append at ``pos`` (a scalar for
    lockstep batches or a (B,) vector for ragged/per-lane batches)."""
    b = tok.shape[0]
    dh = cfg.head_dim
    x = embedding(params["embed_tokens"], tok[:, None])
    if getattr(pos, "ndim", 0) == 1:
        x = x + jnp.take(params["embed_positions"], pos + _POS_OFFSET,
                         axis=0)[:, None]
    else:
        x = x + jax.lax.dynamic_slice_in_dim(
            params["embed_positions"], pos + _POS_OFFSET, 1, 0)[None]

    def heads(t):
        return t.reshape(b, 1, cfg.n_head, dh).transpose(0, 2, 1, 3)

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["attn_ln"], x)
        q = heads(dense(lp["q"], h)) * dh ** -0.5
        ck, cv = update_kv_cache(ck, cv, heads(dense(lp["k"], h)),
                                 heads(dense(lp["v"], h)), pos)
        a = mha_decode_step(q, ck, cv, pos + 1)
        x = x + dense(lp["attn_out"],
                      a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model))
        h = layer_norm(lp["ffn_ln"], x)
        x = x + dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(body, x, (params["layers"], cache_k, cache_v))
    x = layer_norm(params["final_ln"], x)
    logits = jnp.einsum("bd,vd->bv", x[:, 0],
                        params["embed_tokens"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits, cache_k, cache_v


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: OPTConfig, prompt_pad: int,
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


def generate_ragged(params: dict, cfg: OPTConfig, prompt: jnp.ndarray,
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
def _compiled_generate(cfg: OPTConfig, prompt_len: int, max_len: int,
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


def generate(params: dict, cfg: OPTConfig, prompt: jnp.ndarray,
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
