"""Sampling ops: temperature, top-k, top-p, repetition penalty.

Analog of the reference's sampling layer — C++ TopK/TopPSamplingLayer and
penalty kernels orchestrated by DynamicDecodeLayer (reference:
cpp/tensorrt_llm/kernels/samplingTopKKernels.cu:417,
samplingTopPKernels.cu:1279, samplingPenaltyKernels.cu,
cpp/tensorrt_llm/layers/dynamicDecodeLayer.h:37-128) — as pure jnp transforms
on a (B, V) logits matrix, composable inside the jitted decode loop with a
threaded PRNG key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1.0e9)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    if temperature == 1.0:
        return logits
    return logits / jnp.float32(max(temperature, 1e-6))


def apply_repetition_penalty(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """CTRL-style repetition penalty over the generated-so-far buffer
    (analog of repetition penalty in samplingPenaltyKernels.cu). tokens:
    (B, max_len); positions > pos are ignored."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    max_len = tokens.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1)
    # pos: scalar (lockstep batch) or (B,) per-lane positions (ragged)
    valid = idx <= (pos[:, None] if getattr(pos, "ndim", 0) == 1 else pos)
    # scatter-max instead of a (B, max_len, V) one-hot: at V=51864 the
    # one-hot materializes ~100+ MB *per decode step* inside the loop
    seen = jnp.zeros((b, v), bool).at[jnp.arange(b)[:, None], tokens].max(valid)
    pen = jnp.float32(penalty)
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen, penalized, logits)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits per row, -inf the rest (analog of
    samplingTopKKernels.cu)."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][:, -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability exceeds p (analog of samplingTopPKernels.cu)."""
    if p <= 0.0 or p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob crosses p (always keep the top-1)
    keep_sorted = cum - probs < p
    # threshold = smallest kept logit
    thresholds = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.float32(jnp.inf)), axis=-1
    )
    return jnp.where(logits < thresholds[:, None], NEG_INF, logits)


def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    tokens: Optional[jnp.ndarray] = None,
    pos: Optional[jnp.ndarray] = None,
    repetition_penalty: float = 1.0,
    do_sample: bool = False,
) -> jnp.ndarray:
    """Full sampling pipeline: penalties → temperature → top-k → top-p →
    categorical draw. Semantics follow the reference's SamplingConfig, not
    HF's do_sample gate: any non-neutral knob (temperature/top_k/top_p)
    implies a stochastic draw; repetition-penalty-only configs stay
    deterministic (penalized greedy); ``do_sample=True`` forces a
    categorical draw even with all-neutral knobs (plain temperature-1
    multinomial)."""
    if tokens is not None and repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, tokens, pos, repetition_penalty)
    if (not do_sample and temperature == 1.0 and top_k <= 0
            and (top_p <= 0.0 or top_p >= 1.0)):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = apply_temperature(logits, temperature)
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

def _seen_mask(logits: jnp.ndarray, tokens: jnp.ndarray,
               pos: jnp.ndarray) -> jnp.ndarray:
    """(B, V) bool — token appears in tokens[:, :pos+1] (prompt+generated,
    the reference's penalty context: samplingPenaltyKernels.cu index loop
    over [0, step))."""
    b, v = logits.shape
    max_len = tokens.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1)
    valid = idx <= (pos[:, None] if getattr(pos, "ndim", 0) == 1 else pos)
    return jnp.zeros((b, v), bool).at[jnp.arange(b)[:, None], tokens].max(valid)


def apply_presence_penalty(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """Additive presence penalty: subtract a constant from every token already
    present in the sequence (analog of RepetitionPenaltyType::Additive,
    cpp/tensorrt_llm/kernels/samplingPenaltyKernels.cu:217-219; exposed as
    SamplingConfig.presence_penalty, tensorrt_llm/runtime/generation.py:131)."""
    if penalty == 0.0:
        return logits
    seen = _seen_mask(logits, tokens, pos)
    return jnp.where(seen, logits - jnp.float32(penalty), logits)


def apply_min_new_tokens(
    logits: jnp.ndarray,
    gen_count: jnp.ndarray,
    min_new_tokens: int,
    eos_token_id: int,
) -> jnp.ndarray:
    """Ban EOS until at least ``min_new_tokens`` tokens have been generated
    (analog of batchApplyMinLengthPenalty,
    cpp/tensorrt_llm/kernels/samplingPenaltyKernels.cu:399-411; exposed as
    SamplingConfig.min_length, tensorrt_llm/runtime/generation.py:130).
    ``gen_count`` — scalar or (B,) count of tokens generated so far (the
    candidate not included), so EOS itself may be generated token number
    min_new_tokens+1, guaranteeing min_new_tokens real tokens (HF
    MinNewTokensLengthLogitsProcessor semantics)."""
    if min_new_tokens <= 0:
        return logits
    short = gen_count < jnp.int32(min_new_tokens)   # scalar or (B,)
    short = jnp.broadcast_to(short, (logits.shape[0],))
    return logits.at[:, eos_token_id].set(
        jnp.where(short, NEG_INF, logits[:, eos_token_id]))


def pad_word_list(words) -> tuple:
    """[[ids...], ...] → (numpy (W, Lmax) int32 padded with -1,
    numpy (W,) int32 lengths). Numpy on purpose: word tables live in jitted
    closures and must not become tracers at build time (they convert to
    constants at trace time). The reference encodes the same data as a
    flat ids+offsets tensor pair (banBadWords.cu:36-47)."""
    import numpy as np
    if not words:
        raise ValueError("empty word list")
    lens = np.asarray([len(w) for w in words], np.int32)
    if (lens < 1).any():
        raise ValueError("every word must have at least one token")
    table = np.full((len(words), int(lens.max())), -1, np.int32)
    for i, w in enumerate(words):
        table[i, : len(w)] = w
    return table, lens


def _trailing_match(tokens: jnp.ndarray, pos: jnp.ndarray,
                    table: jnp.ndarray, match_lens: jnp.ndarray,
                    width: int) -> jnp.ndarray:
    """(B, W) bool — for each word w, tokens[:, pos - match_lens[w] + 1 .. pos]
    equals table[w, :match_lens[w]]. width = table.shape[1] (static).
    Words with match_lens == 0 match vacuously; words needing more context
    than exists (match_lens > pos+1) never match."""
    b = tokens.shape[0]
    max_len = tokens.shape[1]
    pos_b = pos if getattr(pos, "ndim", 0) == 1 else jnp.full((b,), pos)
    j = jnp.arange(width, dtype=jnp.int32)                        # (J,)
    ml = match_lens.astype(jnp.int32)                             # (W,)
    idx = pos_b[:, None, None] - ml[None, :, None] + 1 + j[None, None, :]
    valid_j = j[None, :] < ml[:, None]                            # (W, J)
    gathered = jnp.take_along_axis(
        tokens[:, None, :], jnp.clip(idx, 0, max_len - 1), axis=2)
    tok_match = gathered == table[None, :, :]                     # (B, W, J)
    enough = ml[None, :] <= pos_b[:, None] + 1                    # (B, W)
    return jnp.all(tok_match | ~valid_j[None], axis=2) & enough


def ban_bad_words(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    bad_words: tuple,
) -> jnp.ndarray:
    """Ban the final token of any bad-word sequence whose prefix matches the
    trailing generated context (analog of ban_bad_words,
    cpp/tensorrt_llm/kernels/banBadWords.cu:27-93: single-token words ban
    unconditionally; an n-token word bans token n when the last n-1 written
    tokens equal its first n-1). ``bad_words`` = pad_word_list output;
    ``pos`` — scalar or (B,) index of the last written token."""
    table, lens = bad_words
    table = jnp.asarray(table)
    lens = jnp.asarray(lens, jnp.int32)
    w = table.shape[0]
    match = _trailing_match(tokens, pos, table, lens - 1, table.shape[1])
    last = table[jnp.arange(w), lens - 1]                         # (W,)
    ban = jnp.zeros(logits.shape, bool).at[:, last].max(match)
    return jnp.where(ban, NEG_INF, logits)


def match_stop_words(
    tokens: jnp.ndarray,
    last_pos: jnp.ndarray,
    stop_words: tuple,
) -> jnp.ndarray:
    """(B,) bool — the window ending at ``last_pos`` (inclusive) equals some
    full stop sequence (analog of stop_words_criterion,
    cpp/tensorrt_llm/kernels/stopCriteriaKernels.cu:27-85; exposed through
    DynamicDecodeLayer's stop_words_list input). ``stop_words`` =
    pad_word_list output."""
    table, lens = stop_words
    table = jnp.asarray(table)
    lens = jnp.asarray(lens, jnp.int32)
    return jnp.any(
        _trailing_match(tokens, last_pos, table, lens, table.shape[1]), axis=1)
