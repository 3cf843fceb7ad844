"""Generation runtime: fully on-device greedy (and beam) decoding.

Analog of the reference's GenerationSession + greedy_search
(reference: tensorrt_llm/runtime/generation.py:104-1000 and
examples/whisper/run.py:171-227), redesigned per SURVEY.md §7 inversion 3:
the token loop is a ``lax.while_loop`` *inside one jit* — KV caches stay
resident in HBM (donated across steps), logits processors are vectorized
masks, EOS tracking is a boolean lane — so the per-step host round-trips,
output mallocs and cache clones of the reference
(examples/whisper/run.py:128-148) go to zero.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import model as wmodel
from whisper_trtllm_tpu.runtime import logits_process as lp
from whisper_trtllm_tpu.runtime import sampling


def kv_quant_dtype(kv_cache_dtype: str):
    """GenerationConfig.kv_cache_dtype → storage dtype for the quantized KV
    path, or None for float caches ("auto"). The reference's
    QuantMode.INT8_KV_CACHE / FP8_KV_CACHE dispatch (reference:
    tensorrt_llm/quantization/mode.py:17-18,61-66)."""
    table = {"auto": None, "int8": jnp.int8, "fp8": jnp.float8_e4m3fn}
    if kv_cache_dtype not in table:
        raise ValueError(
            f"kv_cache_dtype must be one of {sorted(table)}, "
            f"got {kv_cache_dtype!r}")
    return table[kv_cache_dtype]


class GreedyState(NamedTuple):
    """Decode-loop carry (analog of the reference's ad-hoc per-step buffers,
    examples/whisper/run.py:195-225)."""

    tokens: jnp.ndarray    # (B, max_len) i32
    pos: jnp.ndarray       # scalar i32 — index of the last filled position
    finished: jnp.ndarray  # (B,) bool
    self_kv: tuple         # float (k, v) or int8 (kq, ks, vq, vs) caches
    key: jnp.ndarray       # PRNG key (sampling; unused under pure greedy)


def _greedy_decode_impl(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    max_len: int,
    suppress_mask: jnp.ndarray,
    begin_suppress_mask: jnp.ndarray,
    forced_map: jnp.ndarray,
    begin_index: int,
    timestamps: bool = False,
    gen: Optional[GenerationConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """enc_states (B, 1500, d) → (tokens (B, max_len), lengths (B,))."""
    batch = enc_states.shape[0]
    cache_dtype = enc_states.dtype
    gen = gen or GenerationConfig()
    kv_qdtype = kv_quant_dtype(gen.kv_cache_dtype)

    cross_k, cross_v = wmodel.compute_cross_kv(params, cfg, enc_states)
    if kv_qdtype is not None:
        cross_kv = wmodel.quantize_cross_kv(cross_k, cross_v, kv_qdtype)
        self_kv = wmodel.init_self_kv_quant(cfg, batch, max_len, kv_qdtype)
    else:
        cross_kv = (cross_k, cross_v)
        self_kv = wmodel.init_self_kv(cfg, batch, max_len, dtype=cache_dtype)

    tokens0 = jnp.full((batch, max_len), cfg.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cfg.decoder_start_token_id)

    state = GreedyState(
        tokens=tokens0,
        pos=jnp.int32(0),
        finished=jnp.zeros((batch,), bool),
        self_kv=self_kv,
        key=jax.random.PRNGKey(gen.seed),
    )

    def cond(s: GreedyState):
        return jnp.logical_and(s.pos < max_len - 1, ~jnp.all(s.finished))

    def body(s: GreedyState):
        cur = jax.lax.dynamic_index_in_dim(s.tokens, s.pos, axis=1, keepdims=False)
        logits, new_self_kv = wmodel.decode_step_kv(
            params, cfg, cur, s.pos, s.self_kv, cross_kv
        )
        nxt_pos = s.pos + 1
        logits = logits + suppress_mask[None]
        logits = jnp.where(nxt_pos == begin_index, logits + begin_suppress_mask[None], logits)
        if timestamps:
            logits = lp.apply_timestamp_rules(
                logits, s.tokens, s.pos, begin_index,
                cfg.no_timestamps_token_id + 1, cfg.eos_token_id,
                cfg.max_initial_timestamp_index,
            )
        step_key, carry_key = jax.random.split(s.key)
        nxt = sampling.sample_token(
            step_key, logits,
            temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p,
            tokens=s.tokens, pos=s.pos,
            repetition_penalty=gen.repetition_penalty,
        )
        forced = forced_map[nxt_pos]
        nxt = jnp.where(forced >= 0, forced, nxt)
        nxt = jnp.where(s.finished, jnp.int32(cfg.pad_token_id), nxt)
        finished = jnp.logical_or(s.finished, nxt == cfg.eos_token_id)
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, nxt_pos))
        return GreedyState(tokens, nxt_pos, finished, new_self_kv, carry_key)

    final = jax.lax.while_loop(cond, body, state)

    # length = index of first EOS + 1 (incl.), else max_len
    is_eos = final.tokens == cfg.eos_token_id
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, max_len).astype(jnp.int32)
    return final.tokens, lengths


@functools.lru_cache(maxsize=16)
def _compiled_greedy(
    cfg: WhisperConfig,
    max_len: int,
    timestamps: bool = False,
    gen: Optional[GenerationConfig] = None,
):
    # numpy (not jnp) constants: this function may be first called inside an
    # outer jit trace, and jnp arrays created there would be tracers leaking
    # into the lru-cached closure.
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)
    if timestamps and cfg.no_timestamps_token_id is None:
        raise ValueError("timestamp decoding needs cfg.no_timestamps_token_id")
    forced_map, begin_index = lp.build_forced_map(cfg, max_len,
                                                  timestamps=timestamps)

    def fn(params, enc_states):
        # jnp conversion happens *inside* the traced function, fresh per trace
        return _greedy_decode_impl(
            params, cfg, enc_states, max_len,
            jnp.asarray(suppress_mask), jnp.asarray(begin_mask),
            jnp.asarray(forced_map), begin_index, timestamps, gen,
        )

    return jax.jit(fn)


def greedy_decode(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    gen: Optional[GenerationConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy search. Returns (tokens (B, max_len), lengths (B,)).

    Tokens include the decoder_start prompt and forced prefix; positions at
    and after EOS hold pad_token_id (mirrors the reference's EOS masking,
    examples/whisper/run.py:205-217).
    """
    gen = gen or GenerationConfig()
    max_len = min(cfg.max_target_positions, gen.max_new_tokens + 1)
    return _compiled_greedy(cfg, max_len, gen.return_timestamps, gen)(
        params, enc_states
    )


@functools.lru_cache(maxsize=16)
def _compiled_encode(cfg: WhisperConfig):
    return jax.jit(lambda p, m: wmodel.encode(p, cfg, m))


def transcribe_tokens(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    gen: Optional[GenerationConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, 3000, n_mels) → (tokens, lengths): encode + greedy decode,
    end to end on device. The encoder runs through a cached jit (under an
    outer trace it inlines; called eagerly it would otherwise dispatch the
    conv stem + every scanned layer as separate device calls — ruinous on
    this environment's high per-call latency)."""
    enc = _compiled_encode(cfg)(params, mel)
    return greedy_decode(params, cfg, enc, gen)


@functools.lru_cache(maxsize=16)
def _compiled_detect(cfg: WhisperConfig):
    def fn(params, enc_states, ids):
        batch = enc_states.shape[0]
        cross_kv = wmodel.compute_cross_kv(params, cfg, enc_states)
        self_kv = wmodel.init_self_kv(cfg, batch, 2, dtype=enc_states.dtype)
        start = jnp.full((batch,), cfg.decoder_start_token_id, jnp.int32)
        logits, _ = wmodel.decode_step_kv(
            params, cfg, start, jnp.int32(0), self_kv, cross_kv
        )
        lang_logits = logits[:, ids]                  # (B, n_langs)
        return ids[jnp.argmax(lang_logits, axis=-1)]

    return jax.jit(fn)


def detect_language(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    lang_token_ids,
) -> jnp.ndarray:
    """Language identification for multilingual checkpoints: one decode step
    from <|startoftranscript|>, argmax restricted to the language tokens
    (mirrors HF WhisperForConditionalGeneration.detect_language semantics;
    the reference pipeline is .en-only and skips this). Returns (B,) token
    ids drawn from ``lang_token_ids``."""
    ids = jnp.asarray(np.asarray(lang_token_ids, np.int32))
    return _compiled_detect(cfg)(params, enc_states, ids)


@functools.lru_cache(maxsize=16)
def _compiled_greedy_prompted(cfg: WhisperConfig, max_len: int, prompt_len: int):
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)

    def fn(params, enc_states, prompt):
        batch = enc_states.shape[0]
        cross_k, cross_v = wmodel.compute_cross_kv(params, cfg, enc_states)
        cross_kv = (cross_k, cross_v)
        self_kv = wmodel.init_self_kv(cfg, batch, max_len,
                                      dtype=enc_states.dtype)
        tokens0 = jnp.full((batch, max_len), cfg.pad_token_id, jnp.int32)
        tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt, (0, 0))
        state = GreedyState(
            tokens=tokens0, pos=jnp.int32(0),
            finished=jnp.zeros((batch,), bool), self_kv=self_kv,
            key=jax.random.PRNGKey(0),
        )
        sup = jnp.asarray(suppress_mask)
        beg = jnp.asarray(begin_mask)
        begin_index = prompt_len  # first free position

        def cond(s):
            return jnp.logical_and(s.pos < max_len - 1, ~jnp.all(s.finished))

        def body(s):
            cur = jax.lax.dynamic_index_in_dim(s.tokens, s.pos, 1, keepdims=False)
            logits, new_self_kv = wmodel.decode_step_kv(
                params, cfg, cur, s.pos, s.self_kv, cross_kv
            )
            nxt_pos = s.pos + 1
            logits = logits + sup[None]
            logits = jnp.where(nxt_pos == begin_index,
                               logits + beg[None], logits)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # inside the prompt window, the next token is the prompt token
            in_prompt = nxt_pos < prompt_len
            prompt_tok = jnp.take_along_axis(
                prompt, jnp.minimum(nxt_pos, prompt_len - 1)[None, None]
                .repeat(prompt.shape[0], 0), axis=1
            )[:, 0]
            nxt = jnp.where(in_prompt, prompt_tok, nxt)
            nxt = jnp.where(s.finished, jnp.int32(cfg.pad_token_id), nxt)
            finished = jnp.logical_or(
                s.finished, jnp.logical_and(~in_prompt, nxt == cfg.eos_token_id)
            )
            tokens = jax.lax.dynamic_update_slice(
                s.tokens, nxt[:, None], (0, nxt_pos))
            return GreedyState(tokens, nxt_pos, finished, new_self_kv, s.key)

        final = jax.lax.while_loop(cond, body, state)
        is_eos = final.tokens == cfg.eos_token_id
        # ignore any EOS inside the prompt window
        col = jnp.arange(max_len)[None]
        is_eos = jnp.logical_and(is_eos, col >= prompt_len)
        any_eos = jnp.any(is_eos, axis=1)
        first_eos = jnp.argmax(is_eos, axis=1)
        lengths = jnp.where(any_eos, first_eos + 1, max_len).astype(jnp.int32)
        return final.tokens, lengths

    return jax.jit(fn)


def greedy_decode_prompted(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    prompt: jnp.ndarray,
    gen: Optional[GenerationConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode seeded with a full decoder prompt (B, P) — e.g.
    [<|startofprev|>, ...prev text..., <|startoftranscript|>, lang, task]
    for conditioned long-form, or HF's decoder_input_ids. The prompt is
    teacher-forced through the same cached loop (prompt prefill).

    Supports max_new_tokens only — sampling/timestamp/int8-KV knobs are not
    wired into the prompted loop, and silently ignoring them would make a
    conditioned long-form pass behave differently from its first chunk."""
    gen = gen or GenerationConfig()
    unsupported = []
    if gen.temperature != 1.0 or gen.top_k or (0.0 < gen.top_p < 1.0) \
            or gen.repetition_penalty != 1.0:
        unsupported.append("sampling")
    if gen.return_timestamps:
        unsupported.append("return_timestamps")
    if gen.kv_cache_dtype != "auto":
        unsupported.append(f"kv_cache_dtype={gen.kv_cache_dtype!r}")
    if gen.num_beams > 1:
        unsupported.append("num_beams>1")
    if unsupported:
        raise NotImplementedError(
            "greedy_decode_prompted supports greedy float-cache decoding "
            f"only; unsupported in GenerationConfig: {', '.join(unsupported)}")
    prompt = jnp.asarray(prompt, jnp.int32)
    prompt_len = prompt.shape[1]
    max_len = min(cfg.max_target_positions, gen.max_new_tokens + prompt_len)
    return _compiled_greedy_prompted(cfg, max_len, prompt_len)(
        params, enc_states, prompt
    )
