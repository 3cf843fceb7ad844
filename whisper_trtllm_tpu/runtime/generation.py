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


def apply_cross_layout(cross_kv, layout: str):
    """Resolve GenerationConfig.cross_kv_layout and transpose the cross-KV
    tuple to T-minor when asked ("auto": T-minor iff quantized — the
    measured 2.38x cross-read win, scripts/cross_attn_probe.py; float stays
    dh-minor so the fused-step path keeps engaging). decode_step_kv detects
    the layout from static shapes, so this is the only touch point."""
    if layout not in ("auto", "bhtd", "bhdt"):
        raise ValueError(
            f"cross_kv_layout must be auto|bhtd|bhdt, got {layout!r}")
    quantized = len(cross_kv) == 4
    if layout == "bhdt" or (layout == "auto" and quantized):
        k = cross_kv[0]
        if k.shape[-2] == k.shape[-1]:
            # square (Tc == dh) caches: the shape-based layout detection in
            # cross_kv_t_major cannot tell T-minor from dh-minor, so a
            # transpose here would be silently misread downstream as the
            # default layout and produce wrong attention output. Only toy
            # configs hit this (real presets have Tc=1500 >> dh); refuse
            # rather than corrupt.
            if layout == "bhdt":
                raise ValueError(
                    "cross_kv_layout='bhdt' is unsupported when the padded "
                    f"encoder length equals head_dim ({k.shape[-2]}): the "
                    "T-minor layout would be undetectable from shapes")
            return cross_kv  # auto: keep the unambiguous default layout
        return wmodel.transpose_cross_kv(cross_kv)
    return cross_kv


class GreedyState(NamedTuple):
    """Decode-loop carry (analog of the reference's ad-hoc per-step buffers,
    examples/whisper/run.py:195-225)."""

    tokens: jnp.ndarray    # (B, max_len) i32
    pos: jnp.ndarray       # scalar i32 — index of the last filled position
    finished: jnp.ndarray  # (B,) bool
    lengths: jnp.ndarray   # (B,) i32 — filled length, recorded at finish
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
    prompt: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """enc_states (B, 1500, d) → (tokens (B, max_len), lengths (B,)).

    One loop serves the plain and the prompted (decoder_input_ids /
    conditioned long-form) paths: ``prompt`` (B, P) teacher-forces the first
    P positions, so every processor — sampling knobs, timestamp rules,
    quantized KV, word rules — behaves identically whichever way a chunk is
    seeded (the reference's DynamicDecodeLayer applies its full stack on
    every path, cpp/tensorrt_llm/layers/dynamicDecodeLayer.h:37-128).
    """
    batch = enc_states.shape[0]
    cache_dtype = enc_states.dtype
    gen = gen or GenerationConfig()
    kv_qdtype = kv_quant_dtype(gen.kv_cache_dtype)
    prompt_len = 1 if prompt is None else prompt.shape[1]
    # word tables are numpy at trace time (static tuples of python ints)
    bad_tbl = (tuple(map(jnp.asarray, sampling.pad_word_list(gen.bad_words)))
               if gen.bad_words else None)
    stop_tbl = (tuple(map(jnp.asarray, sampling.pad_word_list(gen.stop_words)))
                if gen.stop_words else None)

    cross_k, cross_v = wmodel.compute_cross_kv(params, cfg, enc_states)
    if kv_qdtype is not None:
        cross_kv = wmodel.quantize_cross_kv(cross_k, cross_v, kv_qdtype)
        self_kv = wmodel.init_self_kv_quant(cfg, batch, max_len, kv_qdtype)
    else:
        cross_kv = (cross_k, cross_v)
        self_kv = wmodel.init_self_kv(cfg, batch, max_len, dtype=cache_dtype)
    cross_kv = apply_cross_layout(cross_kv, gen.cross_kv_layout)

    tokens0 = jnp.full((batch, max_len), cfg.pad_token_id, jnp.int32)
    if prompt is None:
        tokens0 = tokens0.at[:, 0].set(cfg.decoder_start_token_id)
    else:
        tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt, (0, 0))

    state = GreedyState(
        tokens=tokens0,
        pos=jnp.int32(0),
        finished=jnp.zeros((batch,), bool),
        lengths=jnp.full((batch,), max_len, jnp.int32),
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
        # penalty / word-rule processors (reference order: penalties before
        # sampling, dynamicDecodeLayer.cpp forward)
        if gen.presence_penalty != 0.0:
            logits = sampling.apply_presence_penalty(
                logits, s.tokens, s.pos, gen.presence_penalty)
        if gen.min_new_tokens > 0:
            logits = sampling.apply_min_new_tokens(
                logits, nxt_pos - begin_index, gen.min_new_tokens,
                cfg.eos_token_id)
        if bad_tbl is not None:
            logits = sampling.ban_bad_words(logits, s.tokens, s.pos, bad_tbl)
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
        if prompt_len > 1:
            # inside the prompt window the next token is the prompt token
            in_prompt = nxt_pos < prompt_len
            prompt_tok = jax.lax.dynamic_index_in_dim(
                prompt, jnp.minimum(nxt_pos, prompt_len - 1), axis=1,
                keepdims=False)
            nxt = jnp.where(in_prompt, prompt_tok, nxt)
        else:
            in_prompt = jnp.bool_(False)
        nxt = jnp.where(s.finished, jnp.int32(cfg.pad_token_id), nxt)
        newly = jnp.logical_and(
            ~s.finished,
            jnp.logical_and(~in_prompt, nxt == cfg.eos_token_id))
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, nxt_pos))
        if stop_tbl is not None:
            stopped = jnp.logical_and(
                sampling.match_stop_words(tokens, nxt_pos, stop_tbl),
                nxt_pos >= begin_index)
            newly = jnp.logical_or(newly, jnp.logical_and(~s.finished, stopped))
        finished = jnp.logical_or(s.finished, newly)
        lengths = jnp.where(newly, nxt_pos + 1, s.lengths)
        return GreedyState(tokens, nxt_pos, finished, lengths,
                           new_self_kv, carry_key)

    final = jax.lax.while_loop(cond, body, state)
    return final.tokens, final.lengths


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
def _compiled_greedy_prompted(
    cfg: WhisperConfig,
    max_len: int,
    prompt_len: int,
    gen: Optional[GenerationConfig] = None,
):
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)
    # the prompt carries the forced prefix itself; nothing is forced by map
    forced_map = np.full((max_len,), -1, np.int32)
    gen = gen or GenerationConfig()
    if gen.return_timestamps and cfg.no_timestamps_token_id is None:
        raise ValueError("timestamp decoding needs cfg.no_timestamps_token_id")

    def fn(params, enc_states, prompt):
        return _greedy_decode_impl(
            params, cfg, enc_states, max_len,
            jnp.asarray(suppress_mask), jnp.asarray(begin_mask),
            jnp.asarray(forced_map), prompt_len,
            gen.return_timestamps, gen, prompt,
        )

    return jax.jit(fn)


def greedy_decode_prompted(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    prompt: jnp.ndarray,
    gen: Optional[GenerationConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy/sampled decode seeded with a full decoder prompt (B, P) — e.g.
    [<|startofprev|>, ...prev text..., <|startoftranscript|>, lang, task]
    for conditioned long-form, or HF's decoder_input_ids. The prompt is
    teacher-forced through the same unified loop as ``greedy_decode``, so
    the full GenerationConfig — sampling, timestamps, quantized KV, word
    rules — applies identically to prompted chunks (``begin_index`` is the
    first post-prompt position). ``num_beams > 1`` stays unsupported here:
    prompted beam search needs a per-beam prompt prefill phase; use
    ``beam.beam_decode`` on unprompted chunks."""
    gen = gen or GenerationConfig()
    if gen.num_beams > 1:
        raise NotImplementedError(
            "greedy_decode_prompted is the single-beam loop; use "
            "beam.beam_decode_prompted for prompted beam search")
    prompt = jnp.asarray(prompt, jnp.int32)
    prompt_len = prompt.shape[1]
    max_len = min(cfg.max_target_positions, gen.max_new_tokens + prompt_len)
    return _compiled_greedy_prompted(cfg, max_len, prompt_len, gen)(
        params, enc_states, prompt
    )
