"""Vectorized logits processors as precomputed masks/maps.

The reference applies HF's per-step Python logits processors on GPU tensors
between engine calls (reference: examples/whisper/run.py:150-169,202 using
SuppressTokensLogitsProcessor / SuppressTokensAtBeginLogitsProcessor /
ForceTokensLogitsProcessor, transformers/src/transformers/generation/
logits_process.py:1281,1300,1313). Here they are data: a static additive
suppress mask, a begin-suppress mask applied at one position, and a forced-
token map indexed by position — all folded into the jitted decode loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import WhisperConfig


def build_suppress_mask(cfg: WhisperConfig) -> np.ndarray:
    """(V,) additive mask: -inf at always-suppressed token ids."""
    mask = np.zeros((cfg.vocab_size,), np.float32)
    ids = [t for t in cfg.suppress_tokens if 0 <= t < cfg.vocab_size]
    if ids:
        mask[np.asarray(ids)] = -np.inf
    return mask


def build_begin_suppress_mask(cfg: WhisperConfig) -> np.ndarray:
    """(V,) additive mask applied only at the first *free* position."""
    mask = np.zeros((cfg.vocab_size,), np.float32)
    ids = [t for t in cfg.begin_suppress_tokens if 0 <= t < cfg.vocab_size]
    if ids:
        mask[np.asarray(ids)] = -np.inf
    return mask


def build_forced_map(cfg: WhisperConfig, max_len: int,
                     timestamps: bool = False) -> Tuple[np.ndarray, int]:
    """Forced-token map: arr (max_len,) int32 with token id at forced
    positions and -1 elsewhere; plus ``begin_index`` — the first free
    position (where begin-suppress applies, matching HF semantics where
    begin_index = prompt length + last forced position).

    ``timestamps=True`` drops a forced <|notimestamps|> entry (the .en
    presets pin one): HF removes it from forced_decoder_ids when
    return_timestamps is requested — otherwise the model would be
    conditioned on no-timestamps while the timestamp rules simultaneously
    suppress that token and force timestamps (HF
    WhisperGenerationMixin._retrieve_logit_processors does the same strip)."""
    arr = np.full((max_len,), -1, np.int32)
    last_forced = 0
    for pos, tok in cfg.forced_decoder_ids:
        if timestamps and tok == cfg.no_timestamps_token_id:
            continue
        if pos < max_len:
            arr[pos] = tok
        last_forced = max(last_forced, pos)
    begin_index = 1 + last_forced  # prompt is [decoder_start] (length 1)
    return arr, begin_index


def apply_timestamp_rules(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    begin_index: int,
    timestamp_begin: int,
    eos_token_id: int,
    max_initial_timestamp_index: int | None = 1,
    detect_from_logprob: bool = True,
) -> jnp.ndarray:
    """Vectorized Whisper timestamp rules (mirrors HF
    WhisperTimeStampLogitsProcessor, transformers/generation/
    logits_process.py — pairs, monotonicity, max-initial, logprob-mass),
    jit/vmap-friendly: no Python branching on runtime values.

    logits: (B, V) fp32 scores BEFORE softmax; tokens: (B, max_len) buffer;
    pos: scalar index of the last filled position. <|notimestamps|> is
    ``timestamp_begin - 1`` and is always suppressed here.
    """
    b, v = logits.shape
    max_len = tokens.shape[1]
    neg = jnp.float32(-jnp.inf)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)

    # suppress <|notimestamps|>
    logits = jnp.where(col == timestamp_begin - 1, neg, logits)

    seq_len = pos + 1 - begin_index                       # generated so far
    last_tok = jnp.take_along_axis(
        tokens, jnp.broadcast_to(pos, (b,))[:, None], axis=1
    )[:, 0]
    penult_tok = jnp.take_along_axis(
        tokens, jnp.broadcast_to(jnp.maximum(pos - 1, 0), (b,))[:, None], axis=1
    )[:, 0]
    last_was_ts = jnp.logical_and(seq_len >= 1, last_tok >= timestamp_begin)
    penult_was_ts = jnp.logical_or(seq_len < 2, penult_tok >= timestamp_begin)

    # pairs rule
    force_text = jnp.logical_and(last_was_ts, penult_was_ts)      # (B,)
    force_ts = jnp.logical_and(last_was_ts, ~penult_was_ts)
    logits = jnp.where(
        force_text[:, None] & (col >= timestamp_begin), neg, logits
    )
    logits = jnp.where(force_ts[:, None] & (col < eos_token_id), neg, logits)

    # monotonicity: find the most recent timestamp token in [begin_index, pos]
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1)
    in_window = (idx >= begin_index) & (idx <= pos)
    is_ts = in_window & (tokens >= timestamp_begin)
    last_ts_pos = jnp.max(jnp.where(is_ts, idx, -1), axis=1)      # (B,)
    has_ts = last_ts_pos >= 0
    last_ts_val = jnp.take_along_axis(
        tokens, jnp.maximum(last_ts_pos, 0)[:, None], axis=1
    )[:, 0]
    ts_floor = jnp.where(force_ts, last_ts_val, last_ts_val + 1)
    logits = jnp.where(
        has_ts[:, None] & (col >= timestamp_begin) & (col < ts_floor[:, None]),
        neg, logits,
    )

    # first generated position: timestamps only, bounded initial index
    at_begin = (pos + 1) == begin_index
    logits = jnp.where(at_begin & (col < timestamp_begin), neg, logits)
    if max_initial_timestamp_index is not None:
        last_allowed = timestamp_begin + max_initial_timestamp_index
        logits = jnp.where(at_begin & (col > last_allowed), neg, logits)

    # timestamp probability mass rule
    if detect_from_logprob:
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_mask = col >= timestamp_begin                           # (1, V)
        ts_lp = jax.nn.logsumexp(
            jnp.where(ts_mask, logprobs, neg), axis=-1
        )
        max_text_lp = jnp.max(jnp.where(~ts_mask, logprobs, neg), axis=-1)
        force = (ts_lp > max_text_lp)[:, None]
        logits = jnp.where(force & (col < timestamp_begin), neg, logits)

    return logits
