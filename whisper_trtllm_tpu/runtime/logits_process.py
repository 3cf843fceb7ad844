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


def build_forced_map(cfg: WhisperConfig, max_len: int) -> Tuple[np.ndarray, int]:
    """Forced-token map: arr (max_len,) int32 with token id at forced
    positions and -1 elsewhere; plus ``begin_index`` — the first free
    position (where begin-suppress applies, matching HF semantics where
    begin_index = prompt length + last forced position)."""
    arr = np.full((max_len,), -1, np.int32)
    last_forced = 0
    for pos, tok in cfg.forced_decoder_ids:
        if pos < max_len:
            arr[pos] = tok
        last_forced = max(last_forced, pos)
    begin_index = 1 + last_forced  # prompt is [decoder_start] (length 1)
    return arr, begin_index
