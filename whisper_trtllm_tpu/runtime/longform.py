"""Long-form audio: host-side 30 s chunk streaming with batched chunks.

The reference handles long audio only by truncation to 30 s upstream
(reference: examples/whisper/get_LibriSpeech.py:26; its HF fork pins
return_timestamps=False, transformers fork modeling_whisper.py:1556 —
no long-form decoding in-tree). Here: split into 30 s windows with optional
overlap, batch the chunks through the jitted pipeline (one compiled shape),
and stitch the per-chunk token streams (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.audio.features import N_SAMPLES, SAMPLE_RATE
from whisper_trtllm_tpu.runtime.session import WhisperSession


def chunk_audio(
    audio: np.ndarray,
    chunk_samples: int = N_SAMPLES,
    overlap_seconds: float = 0.0,
) -> np.ndarray:
    """(n,) → (num_chunks, chunk_samples), zero-padded tail."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    stride = chunk_samples - int(overlap_seconds * SAMPLE_RATE)
    assert stride > 0
    n = len(audio)
    starts = list(range(0, max(n, 1), stride))
    # drop windows fully covered by the previous one
    while len(starts) > 1 and starts[-1] >= n:
        starts.pop()
    chunks = np.zeros((len(starts), chunk_samples), np.float32)
    for i, s in enumerate(starts):
        seg = audio[s : s + chunk_samples]
        chunks[i, : len(seg)] = seg
    return chunks


def transcribe_long(
    session: WhisperSession,
    audio: np.ndarray,
    batch: int = 8,
    overlap_seconds: float = 0.0,
) -> Tuple[List[np.ndarray], int]:
    """Transcribe arbitrarily long audio. Returns (per-chunk token id arrays
    with specials stripped, num_chunks). Chunks ride through the pipeline in
    fixed-size batches so one compiled executable serves any duration."""
    cfg = session.cfg
    chunks = chunk_audio(audio, overlap_seconds=overlap_seconds)
    n = len(chunks)
    outs: List[np.ndarray] = []
    for i in range(0, n, batch):
        cb = chunks[i : i + batch]
        pad = batch - len(cb)
        if pad:
            cb = np.concatenate([cb, np.zeros((pad, cb.shape[1]), np.float32)])
        tokens, lengths = session.transcribe(cb)
        for b in range(len(cb) - pad):
            ids = tokens[b, 1 : lengths[b]]
            ids = ids[(ids != cfg.eos_token_id) & (ids != cfg.pad_token_id)]
            # drop forced prefix tokens (non-text specials)
            forced = {t for _, t in cfg.forced_decoder_ids}
            ids = np.asarray([t for t in ids if int(t) not in forced], np.int32)
            outs.append(ids)
    return outs, n


def transcribe_long_conditioned(
    session: WhisperSession,
    audio: np.ndarray,
    prev_sot_token_id: int,
    prev_context_tokens: int = 16,
    overlap_seconds: float = 0.0,
) -> Tuple[List[np.ndarray], int]:
    """Long-form with previous-text conditioning: each chunk's decoder is
    seeded with [<|startofprev|>, last N text tokens of the previous chunk,
    <|startoftranscript|>, forced ids] (HF condition_on_prev_tokens
    semantics). Chunks run sequentially (chunk i+1's prompt needs chunk i's
    text); the prompt window is a fixed N so one compiled shape serves every
    conditioned chunk."""
    cfg = session.cfg
    chunks = chunk_audio(audio, overlap_seconds=overlap_seconds)
    mels = np.asarray(session.frontend.jit()(jnp.asarray(chunks)))
    return _conditioned_over_features(
        session, mels, prev_sot_token_id, prev_context_tokens
    )


def _conditioned_over_features(session, mels, prev_sot_token_id,
                               prev_context_tokens):
    import jax.numpy as _jnp

    from whisper_trtllm_tpu.models.whisper import model as _wmodel
    from whisper_trtllm_tpu.runtime.generation import (
        greedy_decode_prompted, transcribe_tokens,
    )

    cfg, gen = session.cfg, session.generation
    forced = [cfg.decoder_start_token_id] + [
        t for _, t in sorted(cfg.forced_decoder_ids)
    ]
    specials = {cfg.eos_token_id, cfg.pad_token_id,
                cfg.decoder_start_token_id, prev_sot_token_id,
                *[t for _, t in cfg.forced_decoder_ids]}
    beams = gen.num_beams > 1
    if beams:
        from whisper_trtllm_tpu.runtime.beam import (
            beam_decode,
            beam_decode_prompted,
        )
    outs = []
    prev_text: List[int] = []
    for i in range(len(mels)):
        mel = _jnp.asarray(mels[i : i + 1], session._dtype)
        if len(prev_text) >= prev_context_tokens:
            ctx = prev_text[-prev_context_tokens:]
            prompt = np.asarray([[prev_sot_token_id, *ctx, *forced]], np.int32)
            enc = _wmodel.encode(session.params, cfg, mel)
            if beams:
                t, _, ln = beam_decode_prompted(
                    session.params, cfg, enc, prompt, gen)
                tokens, lengths = t[:, 0], ln[:, 0]
            else:
                tokens, lengths = greedy_decode_prompted(
                    session.params, cfg, enc, prompt, gen
                )
            start = prompt.shape[1]
        else:
            if beams:
                enc = _wmodel.encode(session.params, cfg, mel)
                t, _, ln = beam_decode(session.params, cfg, enc, gen)
                tokens, lengths = t[:, 0], ln[:, 0]
            else:
                tokens, lengths = transcribe_tokens(
                    session.params, cfg, mel, gen)
            start = 1
        toks = np.asarray(tokens)[0, : int(np.asarray(lengths)[0])]
        text_ids = np.asarray(
            [t for t in toks[start:] if int(t) not in specials], np.int32
        )
        outs.append(text_ids)
        prev_text = [int(t) for t in text_ids]
    return outs, len(mels)
