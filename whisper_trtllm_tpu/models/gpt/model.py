"""GPT-style decoder-only model (zoo breadth).

Analog of the reference's GPT family (reference:
tensorrt_llm/models/gpt/model.py, the host framework's flagship), built on
the same layers/ops as Whisper: scanned stacked layers, static KV cache,
fused-QKV attention (reference: tensorrt_llm/layers/attention.py:48-130),
greedy generation with a prompt-prefill pass + on-device step loop (the
context/generation phase split of gptAttentionPlugin, reference:
cpp/tensorrt_llm/plugins/gptAttentionPlugin/).

Weight layout matches HF GPT-2 for conversion-based parity tests.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.layers.init import init_dense, init_embedding, init_layer_norm
from whisper_trtllm_tpu.ops.attention import mha, mha_decode_step, update_kv_cache
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm


@dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 50257
    n_positions: int = 1024
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    ffn_dim: int = 3072
    activation: str = "gelu_new"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 50256

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "GPTConfig":
        kw = dict(vocab_size=89, n_positions=32, d_model=32, n_layer=2,
                  n_head=4, ffn_dim=64, eos_token_id=2)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _init_layer(rng, cfg: GPTConfig) -> dict:
    d = cfg.d_model
    return {
        "ln_1": init_layer_norm(d),
        # fused qkv (column-parallel in TP terms)
        "attn_qkv": init_dense(rng, d, 3 * d),
        "attn_out": init_dense(rng, d, d),
        "ln_2": init_layer_norm(d),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
    }


def init_params(cfg: GPTConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "wte": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "wpe": init_embedding(rng, cfg.n_positions, cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": init_layer_norm(cfg.d_model),
    }


def _attention(lp, x, cfg: GPTConfig, causal: bool):
    b, s, d = x.shape
    qkv = dense(lp["attn_qkv"], layer_norm(lp["ln_1"], x, cfg.layer_norm_eps))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, s, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

    # GPT scales scores by 1/sqrt(dh): fold into q
    q = heads(q) * cfg.head_dim ** -0.5
    a = mha(q, heads(k), heads(v), causal=causal)
    a = a.transpose(0, 2, 1, 3).reshape(b, s, d)
    return dense(lp["attn_out"], a), heads(k), heads(v)


def _mlp(lp, x, cfg: GPTConfig):
    h = layer_norm(lp["ln_2"], x, cfg.layer_norm_eps)
    return dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], h)))


def _embed(params, cfg: GPTConfig, tokens, ptuning):
    """Token embedding, optionally with per-task virtual prompt tokens —
    ids >= vocab_size index the task's page of the prompt table (the
    reference's PromptTuningEmbedding + prompt_embedding_table/tasks engine
    inputs, reference: tensorrt_llm/layers/embedding.py:38-80,
    tensorrt_llm/runtime/generation.py:501-524)."""
    if ptuning is None:
        return embedding(params["wte"], tokens)
    from whisper_trtllm_tpu.ops.functional import prompt_tuning_embedding

    prompt_table, tasks = ptuning
    return prompt_tuning_embedding(params["wte"], prompt_table, tokens, tasks)


def forward(params: dict, cfg: GPTConfig, tokens: jnp.ndarray,
            position_offset: int = 0, ptuning=None) -> jnp.ndarray:
    """Teacher-forced forward: tokens (B, S) → logits (B, S, V) fp32."""
    s = tokens.shape[1]
    x = _embed(params, cfg, tokens, ptuning)
    x = x + params["wpe"][position_offset : position_offset + s][None]

    def body(x, lp):
        a, _, _ = _attention(lp, x, cfg, causal=True)
        x = x + a
        x = x + _mlp(lp, x, cfg)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    return jnp.einsum("bsd,vd->bsv", x, params["wte"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


def _prefill_hidden(params, cfg: GPTConfig, tokens, cache_k, cache_v,
                    ptuning=None):
    """Context phase: run the whole prompt once, writing K/V into the static
    cache (the gptAttentionPlugin context phase). Returns final hidden
    states (B, S, d) — shared by the lockstep prefill (projects [:, -1]) and
    the ragged prefill (gathers each row's last valid position first).
    ``ptuning`` only applies here: generated ids are sampled from vocab
    logits so the generation phase never sees a virtual token."""
    b, s = tokens.shape
    x = _embed(params, cfg, tokens, ptuning)
    x = x + params["wpe"][:s][None]

    def body(x, xs):
        lp, ck, cv = xs
        a, k, v = _attention(lp, x, cfg, causal=True)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        x = x + a
        x = x + _mlp(lp, x, cfg)
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    return layer_norm(params["ln_f"], x, cfg.layer_norm_eps), cache_k, cache_v


def _vocab_logits(params, x):
    return jnp.einsum("bd,vd->bv", x, params["wte"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


def _prefill(params, cfg: GPTConfig, tokens, cache_k, cache_v, ptuning=None):
    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k,
                                          cache_v, ptuning)
    return _vocab_logits(params, x[:, -1]), cache_k, cache_v


def _step(params, cfg: GPTConfig, tok, pos, cache_k, cache_v):
    """Generation phase: one token for the whole batch. ``pos`` is a scalar
    (lockstep) or a (B,) vector (ragged/in-flight per-lane positions — the
    ibGptAttentionPlugin per-request-length analog, reference:
    cpp/tensorrt_llm/plugins/ibGptAttentionPlugin/)."""
    x = embedding(params["wte"], tok[:, None])
    if getattr(pos, "ndim", 0) == 1:
        x = x + jnp.take(params["wpe"], pos, axis=0)[:, None]
    else:
        x = x + jax.lax.dynamic_slice_in_dim(params["wpe"], pos, 1, 0)[None]
    b = tok.shape[0]

    def body(x, xs):
        lp, ck, cv = xs
        h = layer_norm(lp["ln_1"], x, cfg.layer_norm_eps)
        qkv = dense(lp["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, 1, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        q = heads(q) * cfg.head_dim ** -0.5
        ck, cv = update_kv_cache(ck, cv, heads(k), heads(v), pos)
        a = mha_decode_step(q, ck, cv, pos + 1)
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        x = x + _mlp(lp, x, cfg)
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v)
    )
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    logits = jnp.einsum("bd,vd->bv", x[:, 0], params["wte"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits, cache_k, cache_v


def _prefill_ragged(params, cfg: GPTConfig, tokens, lens, cache_k, cache_v):
    """Context phase over a right-padded ragged batch: identical graph to
    _prefill, but each row's logits come from its own last valid position
    (reference: tensorrt_llm/functional.py:3316 gather_last_token_logits)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x, cache_k, cache_v = _prefill_hidden(params, cfg, tokens, cache_k, cache_v)
    return _vocab_logits(params, gather_last_token_logits(x, lens)), \
        cache_k, cache_v


def _prefill_paged(params, cfg: GPTConfig, tokens, lens,
                   pool_k, pool_v, block_tables):
    """Context phase against a paged KV cache: same graph as
    _prefill_ragged, but K/V scatter through per-lane block tables into the
    shared pools (the gptAttentionPlugin context phase with
    paged_kv_cache=True, reference: tensorrt_llm/functional.py:2695-2940
    ``kv_cache_block_pointers`` input). Pools: (L, num_blocks, tpb, H, dh);
    one int32 table serves every layer (the reference keeps per-layer
    pointer arrays only because addresses differ per pool — indices don't).
    """
    from whisper_trtllm_tpu.ops.attention import paged_prefill_update

    b, s = tokens.shape
    x = embedding(params["wte"], tokens)
    x = x + params["wpe"][:s][None]

    def body(x, xs):
        lp, pk, pv = xs
        a, k, v = _attention(lp, x, cfg, causal=True)
        pk, pv = paged_prefill_update(pk, pv, k, v, block_tables, lens)
        x = x + a
        x = x + _mlp(lp, x, cfg)
        return x, (pk, pv)

    x, (pool_k, pool_v) = jax.lax.scan(
        body, x, (params["layers"], pool_k, pool_v))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    return (_vocab_logits(params, gather_last_token_logits(x, lens)),
            pool_k, pool_v)


def _step_paged(params, cfg: GPTConfig, tok, pos, pool_k, pool_v,
                block_tables):
    """Generation phase against the paged cache: identical layer graph to
    _step with (update, attend) swapped for the gather-based paged ops.
    ``pos`` is per-lane (B,) — paged mode exists for in-flight batching."""
    from whisper_trtllm_tpu.ops.attention import (
        paged_mha_decode_step,
        paged_update_kv_cache,
    )

    x = embedding(params["wte"], tok[:, None])
    x = x + jnp.take(params["wpe"], pos, axis=0)[:, None]
    b = tok.shape[0]

    def body(x, xs):
        lp, pk, pv = xs
        h = layer_norm(lp["ln_1"], x, cfg.layer_norm_eps)
        qkv = dense(lp["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, 1, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        q = heads(q) * cfg.head_dim ** -0.5
        pk, pv = paged_update_kv_cache(pk, pv, heads(k), heads(v),
                                       block_tables, pos)
        a = paged_mha_decode_step(q, pk, pv, block_tables, pos + 1)
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, cfg.d_model)
        x = x + dense(lp["attn_out"], a)
        x = x + _mlp(lp, x, cfg)
        return x, (pk, pv)

    x, (pool_k, pool_v) = jax.lax.scan(
        body, x, (params["layers"], pool_k, pool_v))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    return _vocab_logits(params, x[:, 0]), pool_k, pool_v


@functools.lru_cache(maxsize=16)
def _compiled_generate_ragged(cfg: GPTConfig, prompt_pad: int,
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


def generate_ragged(params: dict, cfg: GPTConfig, prompt: jnp.ndarray,
                    prompt_lens, max_new_tokens: int,
                    temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 0.0, repetition_penalty: float = 1.0,
                    seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """Batched generation over variable-length (right-padded) prompts —
    the reference's GenerationSession.decode(input_ids, input_lengths, ...)
    capability (reference: tensorrt_llm/runtime/generation.py:782). Each row
    generates from its own last prompt token; rows are exactly what
    independent per-row generate() calls would produce."""
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
    return _compiled_generate_ragged(
        cfg, prompt.shape[1], max_new_tokens, sc)(params, prompt, prompt_lens)


@functools.lru_cache(maxsize=16)
def _compiled_generate(cfg: GPTConfig, prompt_len: int, max_len: int,
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


def generate(params: dict, cfg: GPTConfig, prompt: jnp.ndarray,
             max_new_tokens: int, temperature: float = 1.0, top_k: int = 0,
             top_p: float = 0.0, repetition_penalty: float = 1.0,
             seed: int = 0, do_sample: bool = False) -> jnp.ndarray:
    """Generation: prompt (B, P) → tokens (B, P + max_new_tokens). Greedy by
    default; sampling knobs mirror the reference's DynamicDecodeLayer
    (reference: cpp/tensorrt_llm/layers/dynamicDecodeLayer.h:37-128). The
    loop itself is the shared runtime.causal_lm.generate_tokens."""
    prompt_len = prompt.shape[1]
    max_len = min(cfg.n_positions, prompt_len + max_new_tokens)
    from whisper_trtllm_tpu.runtime.causal_lm import make_sampling_cfg

    sc = make_sampling_cfg(temperature, top_k, top_p, repetition_penalty,
                           seed, do_sample)
    return _compiled_generate(cfg, prompt_len, max_len, sc)(params, prompt)


@functools.lru_cache(maxsize=16)
def _compiled_generate_ptuning(cfg: GPTConfig, prompt_len: int, max_len: int):
    from whisper_trtllm_tpu.runtime import causal_lm

    def fn(params, prompt, prompt_table, tasks):
        b = prompt.shape[0]
        return causal_lm.generate_tokens(
            lambda p, t, ck, cv: _prefill(p, cfg, t, ck, cv,
                                          (prompt_table, tasks)),
            lambda p, tok, pos, ck, cv: _step(p, cfg, tok, pos, ck, cv),
            params, prompt,
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_len=max_len,
            eos_token_id=cfg.eos_token_id,
        )

    return jax.jit(fn)


def generate_ptuning(params: dict, cfg: GPTConfig, prompt: jnp.ndarray,
                     prompt_table, tasks, max_new_tokens: int) -> jnp.ndarray:
    """Greedy generation where the prompt may contain virtual tokens
    (ids >= vocab_size) resolved against a per-task prompt-embedding table
    (num_tasks, task_vocab, d) — the reference's p-tuning serving path
    (GenerationSession.decode(..., prompt_embedding_table, tasks,
    prompt_vocab_size), reference: tensorrt_llm/runtime/generation.py:786 +
    layers/embedding.py:38-80)."""
    prompt_len = prompt.shape[1]
    max_len = min(cfg.n_positions, prompt_len + max_new_tokens)
    return _compiled_generate_ptuning(cfg, prompt_len, max_len)(
        params, prompt, jnp.asarray(prompt_table),
        jnp.asarray(tasks, jnp.int32))


@functools.lru_cache(maxsize=16)
def _compiled_generate_beam(cfg: GPTConfig, prompt_len: int,
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
            cache_shape=(cfg.n_layer, b, cfg.n_head, max_len, cfg.head_dim),
            prompt_len=prompt_len, max_new_tokens=max_new_tokens,
            eos_token_id=cfg.eos_token_id, num_beams=num_beams,
            length_penalty=length_penalty,
        )

    return jax.jit(fn)


def generate_beam(params: dict, cfg: GPTConfig, prompt: jnp.ndarray,
                  max_new_tokens: int, num_beams: int,
                  length_penalty: float = 1.0):
    """Beam search (HF early_stopping=True semantics): prompt (B, P) →
    (tokens (B, K, P+max_new) best-first, scores, lengths). The reference's
    beam_width>1 GenerationSession path (reference:
    tensorrt_llm/runtime/generation.py:898-975) via runtime.beam_lm."""
    if prompt.shape[1] + max_new_tokens > cfg.n_positions:
        raise ValueError("prompt_len + max_new_tokens exceeds n_positions")
    return _compiled_generate_beam(
        cfg, prompt.shape[1], max_new_tokens, num_beams, length_penalty,
    )(params, prompt)


# -- HF GPT-2 conversion -------------------------------------------------------

def convert_hf_gpt2(hf_model) -> Tuple[dict, GPTConfig]:
    """transformers GPT2LMHeadModel → (params, config). HF GPT-2 Conv1D
    weights are already (in, out) — no transpose."""
    hc = hf_model.config
    cfg = GPTConfig(
        vocab_size=hc.vocab_size, n_positions=hc.n_positions,
        d_model=hc.n_embd, n_layer=hc.n_layer, n_head=hc.n_head,
        ffn_dim=4 * hc.n_embd,
        activation="gelu_new" if hc.activation_function in ("gelu_new", "gelu")
        else hc.activation_function,
        layer_norm_eps=hc.layer_norm_epsilon,
        eos_token_id=hc.eos_token_id if hc.eos_token_id is not None else 50256,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def lin(p):
        return {"kernel": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    layers = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        layers.append({
            "ln_1": ln(p + ".ln_1"),
            "attn_qkv": lin(p + ".attn.c_attn"),
            "attn_out": lin(p + ".attn.c_proj"),
            "ln_2": ln(p + ".ln_2"),
            "fc_in": lin(p + ".mlp.c_fc"),
            "fc_out": lin(p + ".mlp.c_proj"),
        })
    params = {
        "wte": sd["transformer.wte.weight"],
        "wpe": sd["transformer.wpe.weight"],
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "ln_f": ln("transformer.ln_f"),
    }
    return params, cfg
