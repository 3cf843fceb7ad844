"""Beam search, fully on device inside one jit.

Replaces the reference's beam machinery — C++ online-softmax beam kernels,
cache_indirection ping-pong buffers and gather_tree finalization
(reference: cpp/tensorrt_llm/kernels/onlineSoftmaxBeamsearchKernels.cu,
tensorrt_llm/runtime/generation.py:823-975, cpp/tensorrt_llm/thop/
gatherTreeOp.cpp:74) — with the standard alive/finished-pool formulation:
2K candidate expansion per step, EOS candidates retired into a finished pool
with length penalty, beam-parent KV-cache reorder via take_along_axis
(no indirection buffers: XLA turns the gather into an on-device shuffle).
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
from whisper_trtllm_tpu.runtime.generation import (
    apply_cross_layout,
    kv_quant_dtype,
)

NEG_INF = jnp.float32(-1.0e9)


class BeamState(NamedTuple):
    alive_tokens: jnp.ndarray     # (B, K, max_len)
    alive_scores: jnp.ndarray     # (B, K) cumulative log-prob
    finished_tokens: jnp.ndarray  # (B, K, max_len)
    finished_scores: jnp.ndarray  # (B, K) length-penalized
    finished_lengths: jnp.ndarray # (B, K)
    pos: jnp.ndarray              # scalar
    self_kv: tuple                # float (k, v) or int8 (kq, ks, vq, vs)
    es_unsat: jnp.ndarray         # (B,) bool — improvement still possible
                                  # (HF is_early_stop_heuristic_unsatisfied,
                                  # sticky once False)
    all_hit: jnp.ndarray          # scalar bool — every candidate of the last
                                  # expansion hit a stop criterion (HF
                                  # valid_continuations inverse)


def _gather_beams(x: jnp.ndarray, parents: jnp.ndarray, batch: int, k: int):
    """x: (..., B*K, ...) with beam-major layout (L, B*K, H, T, dh) or
    (B, K, ...); parents: (B, K) indices into the old K beams."""
    if x.ndim >= 5:  # cache (L, B*K, H, T, dh)
        l, bk = x.shape[0], x.shape[1]
        xr = x.reshape((l, batch, k) + x.shape[2:])
        idx = parents[None, :, :, None, None, None]
        out = jnp.take_along_axis(xr, idx, axis=2)
        return out.reshape((l, bk) + x.shape[2:])
    # (B, K, ...) tensors
    idx = parents.reshape(parents.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def _length_penalty(length: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return jnp.power(length.astype(jnp.float32), jnp.float32(alpha))


def _beam_decode_impl(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    max_len: int,
    k: int,
    length_penalty: float,
    suppress_mask: jnp.ndarray,
    begin_suppress_mask: jnp.ndarray,
    forced_map: jnp.ndarray,
    begin_index: int,
    gen: GenerationConfig = GenerationConfig(),
    prompt: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    batch = enc_states.shape[0]
    dtype = enc_states.dtype
    vocab = cfg.vocab_size
    kv_cache_dtype = gen.kv_cache_dtype
    timestamps = gen.return_timestamps
    # teacher-forced decoder prompt (B, P): positions < prompt_len are
    # forced per batch row across all beams (HF decoder_input_ids + beams);
    # begin_index must equal prompt_len in that case (caller's contract)
    prompt_len = 1 if prompt is None else prompt.shape[1]
    # word tables are numpy at trace time (static tuples of python ints)
    bad_tbl = (tuple(map(jnp.asarray, sampling.pad_word_list(gen.bad_words)))
               if gen.bad_words else None)
    stop_tbl = (tuple(map(jnp.asarray, sampling.pad_word_list(gen.stop_words)))
                if gen.stop_words else None)
    # early_stopping: True (halt a lane once K hypotheses finish), False
    # (continue while the best running beam could still beat the worst
    # finished one at the current length), or "never" (same, but with a
    # positive length penalty the hypothetical best uses max_length) — the
    # three HF modes (generation/utils.py::_check_early_stop_heuristic)
    es_mode = gen.early_stopping

    # compute cross-KV once per utterance, then tile beam-major
    # (B, ...) -> (B*K, ...) — the analog of the reference's
    # _tile_beam_width (reference: tensorrt_llm/runtime/generation.py:30,
    # 898-915). Tiling *after* the projection avoids running the per-layer
    # K/V projections K times over identical encoder states.
    cross_k, cross_v = wmodel.compute_cross_kv(params, cfg, enc_states)
    cross_k = jnp.repeat(cross_k, k, axis=1)          # (L, B*K, H, Tc, dh)
    cross_v = jnp.repeat(cross_v, k, axis=1)
    kv_qdtype = kv_quant_dtype(kv_cache_dtype)
    if kv_qdtype is not None:
        cross_kv = wmodel.quantize_cross_kv(cross_k, cross_v, kv_qdtype)
        self_kv = wmodel.init_self_kv_quant(cfg, batch * k, max_len,
                                            kv_qdtype)
    else:
        cross_kv = (cross_k, cross_v)
        self_kv = wmodel.init_self_kv(cfg, batch * k, max_len, dtype=dtype)
    cross_kv = apply_cross_layout(cross_kv, gen.cross_kv_layout)

    alive_tokens = jnp.full((batch, k, max_len), cfg.pad_token_id, jnp.int32)
    if prompt is None:
        alive_tokens = alive_tokens.at[:, :, 0].set(cfg.decoder_start_token_id)
    else:
        alive_tokens = jax.lax.dynamic_update_slice(
            alive_tokens, jnp.tile(prompt[:, None, :], (1, k, 1)), (0, 0, 0))
    # only beam 0 is live initially (all beams identical otherwise)
    alive_scores = jnp.tile(
        jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)[None], (batch, 1)
    )

    state = BeamState(
        alive_tokens=alive_tokens,
        alive_scores=alive_scores,
        finished_tokens=jnp.full((batch, k, max_len), cfg.pad_token_id, jnp.int32),
        finished_scores=jnp.full((batch, k), NEG_INF),
        finished_lengths=jnp.zeros((batch, k), jnp.int32),
        pos=jnp.int32(0),
        self_kv=self_kv,
        es_unsat=jnp.ones((batch,), bool),
        all_hit=jnp.asarray(False),
    )

    def pool_full(s: BeamState):
        # a batch lane whose finished pool holds K real hypotheses (HF
        # is_sent_finished all-True for the lane)
        return jnp.all(s.finished_scores > NEG_INF / 2, axis=1)  # (B,)

    def cond(s: BeamState):
        # HF _beam_search_has_unfinished_sequences: improvement possible
        # somewhere AND (early_stopping=True: some lane's pool not full) AND
        # the last expansion left at least one viable continuation
        improvement_possible = jnp.any(s.es_unsat)
        if es_mode is True:
            exists_open = ~jnp.all(pool_full(s))
        else:
            exists_open = jnp.asarray(True)
        return (s.pos < max_len - 1) & improvement_possible & exists_open \
            & ~s.all_hit

    def body(s: BeamState):
        cur = jax.lax.dynamic_index_in_dim(
            s.alive_tokens, s.pos, axis=2, keepdims=False
        ).reshape(batch * k)
        logits, new_self_kv = wmodel.decode_step_kv(
            params, cfg, cur, s.pos, s.self_kv, cross_kv
        )
        nxt_pos = s.pos + 1
        # HF applies logits processors to the already-log-softmaxed scores
        # (generation/utils.py::_beam_search: log_softmax first, then the
        # processor list) — the suppressed tokens' probability mass stays in
        # the normalizer. Masking before the softmax would renormalize and
        # shift every cumulative beam score (verified numerically vs
        # transformers 4.57 with a non-empty suppress list).
        logp = jax.nn.log_softmax(logits, axis=-1)
        # the remaining processors operate on the log-softmaxed scores, like
        # HF's beam-search processor list (-inf masks and additive penalties
        # compose the same either side of the softmax; keeping them here
        # preserves the cumulative-score parity noted above)
        flat_tokens = s.alive_tokens.reshape(batch * k, max_len)
        if gen.presence_penalty != 0.0:
            logp = sampling.apply_presence_penalty(
                logp, flat_tokens, s.pos, gen.presence_penalty)
        if gen.min_new_tokens > 0:
            logp = sampling.apply_min_new_tokens(
                logp, nxt_pos - begin_index, gen.min_new_tokens,
                cfg.eos_token_id)
        if bad_tbl is not None:
            logp = sampling.ban_bad_words(logp, flat_tokens, s.pos, bad_tbl)
        logp = logp + suppress_mask[None]
        logp = jnp.where(
            nxt_pos == begin_index, logp + begin_suppress_mask[None], logp
        )
        if timestamps:
            # HF applies the timestamp processor to the log-softmaxed scores
            # too; its internal logprob-mass rule re-log-softmaxes, which is
            # idempotent on already-normalized scores
            logp = lp.apply_timestamp_rules(
                logp, flat_tokens, s.pos, begin_index,
                cfg.no_timestamps_token_id + 1, cfg.eos_token_id,
                cfg.max_initial_timestamp_index,
            )
        logp = logp.reshape(batch, k, vocab)

        # forced positions: the forced token gets logp 0, everything else -inf
        forced = forced_map[nxt_pos]
        forced_row = jnp.where(
            jnp.arange(vocab)[None, None, :] == forced, 0.0, NEG_INF
        )
        logp = jnp.where(forced >= 0, forced_row, logp)
        if prompt_len > 1:
            # inside the prompt window every beam is forced to the per-row
            # prompt token at zero cost (teacher-forced prompt prefill)
            ptok = jax.lax.dynamic_index_in_dim(
                prompt, jnp.minimum(nxt_pos, prompt_len - 1), axis=1,
                keepdims=False)                                   # (B,)
            prow = jnp.where(
                jnp.arange(vocab)[None, None, :] == ptok[:, None, None],
                0.0, NEG_INF)
            logp = jnp.where(nxt_pos < prompt_len, prow, logp)

        cand = s.alive_scores[:, :, None] + logp              # (B, K, V)
        flat = cand.reshape(batch, k * vocab)
        topv, topi = jax.lax.top_k(flat, 2 * k)               # (B, 2K)
        parents = (topi // vocab).astype(jnp.int32)
        tok_ids = (topi % vocab).astype(jnp.int32)

        seqs = _gather_beams(s.alive_tokens, parents, batch, k)  # (B, 2K, max)
        seqs = jax.lax.dynamic_update_slice(
            seqs, tok_ids[:, :, None], (0, 0, nxt_pos)
        )
        # ---- per-candidate stop criteria (HF next_token_hits_stopping_
        # criteria): EOS, and any stop-word sequence matching the trailing
        # window of the candidate (the reference applies stop_words_list
        # regardless of beam width — cpp/tensorrt_llm/layers/
        # dynamicDecodeLayer.cpp:317-326) ----
        hits_tok = tok_ids == cfg.eos_token_id
        if stop_tbl is not None:
            stop_hit = sampling.match_stop_words(
                seqs.reshape(batch * 2 * k, max_len), nxt_pos, stop_tbl
            ).reshape(batch, 2 * k)
            hits_tok = hits_tok | stop_hit
        if prompt_len > 1:  # a prompt token that happens to equal EOS/stop
            hits_tok = hits_tok & (nxt_pos >= prompt_len)
        # A candidate may retire into the finished pool only if (a) it hit a
        # stop criterion, (b) it ranks within the top K of the 2K expansion
        # (HF's top_num_beam_mask), and (c) it carries a real score —
        # dead-beam candidates sit at ~NEG_INF, which length-penalty
        # division would otherwise drag above the done threshold.
        in_top_k = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * k), 1) < k
        retire = hits_tok & in_top_k & (topv > NEG_INF / 2)

        # ---- alive set: best K non-finished candidates ----
        # Hit candidates never continue decoding, regardless of rank: one
        # ranked >= K is dropped entirely (HF skips it from both pools), not
        # expanded — masking only `retire` here would let it leak into the
        # alive set and condition the decoder on EOS. HF adds -1e9 rather
        # than replacing (so a uniform shift at an all-hit step preserves
        # candidate order) — mirrored here.
        alive_cand = topv + hits_tok.astype(topv.dtype) * NEG_INF
        _, alive_sel = jax.lax.top_k(alive_cand, k)           # (B, K) into 2K
        new_alive_scores = jnp.take_along_axis(alive_cand, alive_sel, axis=1)
        new_alive_tokens = _gather_beams(seqs, alive_sel, batch, 2 * k)
        alive_parents = jnp.take_along_axis(parents, alive_sel, axis=1)

        # ---- finished pool: merge retiring candidates (length-penalized) ----
        fin_len = nxt_pos + 1
        # HF penalizes by cur_len + 1 - decoder_prompt_len: the generated
        # length including the stopping token but excluding the prompt
        fin_cand_scores = jnp.where(
            retire,
            topv / _length_penalty(nxt_pos - (prompt_len - 1),
                                   length_penalty),
            NEG_INF,
        )
        # lanes done stop accepting (HF _update_finished_beams gates):
        # early_stopping=True — pool already full; any mode — the early-stop
        # heuristic says no running beam can improve the pool
        blocked = ~s.es_unsat
        if es_mode is True:
            blocked = blocked | pool_full(s)
        fin_cand_scores = jnp.where(blocked[:, None], NEG_INF, fin_cand_scores)
        merged_scores = jnp.concatenate([s.finished_scores, fin_cand_scores], axis=1)
        merged_tokens = jnp.concatenate([s.finished_tokens, seqs], axis=1)
        merged_lengths = jnp.concatenate(
            [s.finished_lengths, jnp.full((batch, 2 * k), fin_len, jnp.int32)],
            axis=1,
        )
        _, fin_sel = jax.lax.top_k(merged_scores, k)
        new_fin_scores = jnp.take_along_axis(merged_scores, fin_sel, axis=1)
        new_fin_tokens = _gather_beams(merged_tokens, fin_sel, batch, 3 * k)
        new_fin_lengths = jnp.take_along_axis(merged_lengths, fin_sel, axis=1)

        # ---- reorder caches to the surviving alive beams (values and, in
        # int8 mode, their scales) ----
        new_self_kv = tuple(
            _gather_beams(c, alive_parents, batch, k) for c in new_self_kv
        )

        # ---- early-stop heuristic (HF _check_early_stop_heuristic, run for
        # every mode): sticky-False once the best running beam's hypothetical
        # best score cannot beat the worst finished hypothesis. For
        # "never" with a positive penalty the hypothetical length is the
        # max generatable length (longer is better then); otherwise the
        # current generated length. Unfinished pool slots sit at NEG_INF, so
        # the heuristic cannot fire before the pool fills. ----
        if es_mode == "never" and length_penalty > 0.0:
            best_hyp_len = jnp.int32(max_len - prompt_len)
        else:
            # clamp: inside a teacher-forced prompt window the generated
            # length is still 0 (HF prefills the prompt in one forward and
            # never evaluates the heuristic there); 0**penalty would divide
            # the score by zero and latch the heuristic through the nan
            best_hyp_len = jnp.maximum(fin_len - prompt_len, 1)
        best_possible = new_alive_scores[:, 0] / _length_penalty(
            best_hyp_len, length_penalty)
        worst_finished = jnp.min(new_fin_scores, axis=1)
        new_es_unsat = s.es_unsat & (best_possible > worst_finished)

        return BeamState(
            new_alive_tokens, new_alive_scores,
            new_fin_tokens, new_fin_scores, new_fin_lengths,
            nxt_pos, new_self_kv,
            new_es_unsat, jnp.all(hits_tok),
        )

    final = jax.lax.while_loop(cond, body, state)

    # fall back to alive beams only where the finished pool never filled —
    # with early stopping HF discards alive beams once the pool is full.
    # HF's max-length finalization penalizes by (cur_len + 1 -
    # decoder_prompt_len): the generated length excluding the start token
    # (verified numerically vs transformers 4.57 with EOS suppressed so the
    # pool can never fill) — hence alive_len - 1, not alive_len.
    alive_len = final.pos + 1
    alive_final_scores = final.alive_scores / _length_penalty(
        alive_len - prompt_len, length_penalty
    )
    final_blocked = ~final.es_unsat
    if es_mode is True:
        final_blocked = final_blocked | pool_full(final)
    alive_final_scores = jnp.where(
        final_blocked[:, None], NEG_INF, alive_final_scores
    )
    merged_scores = jnp.concatenate(
        [final.finished_scores, alive_final_scores], axis=1
    )
    merged_tokens = jnp.concatenate([final.finished_tokens, final.alive_tokens], axis=1)
    merged_lengths = jnp.concatenate(
        [final.finished_lengths, jnp.full((batch, k), alive_len, jnp.int32)], axis=1
    )
    _, sel = jax.lax.top_k(merged_scores, k)
    out_tokens = _gather_beams(merged_tokens, sel, batch, 2 * k)
    out_scores = jnp.take_along_axis(merged_scores, sel, axis=1)
    out_lengths = jnp.take_along_axis(merged_lengths, sel, axis=1)
    return out_tokens, out_scores, out_lengths


@functools.lru_cache(maxsize=16)
def _compiled_beam(cfg: WhisperConfig, max_len: int,
                   gen: GenerationConfig = GenerationConfig()):
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)
    if gen.return_timestamps and cfg.no_timestamps_token_id is None:
        raise ValueError("timestamp decoding needs cfg.no_timestamps_token_id")
    forced_map, begin_index = lp.build_forced_map(
        cfg, max_len, timestamps=gen.return_timestamps)

    def fn(params, enc_states):
        return _beam_decode_impl(
            params, cfg, enc_states, max_len, gen.num_beams,
            gen.length_penalty,
            jnp.asarray(suppress_mask), jnp.asarray(begin_mask),
            jnp.asarray(forced_map), begin_index, gen,
        )

    return jax.jit(fn)


def beam_decode(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    gen: GenerationConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, K, max_len) best-first, scores (B, K),
    lengths (B, K)).

    ``gen.early_stopping`` supports all three HF modes (True / False /
    "never"); ``gen.stop_words`` retire beams per candidate exactly like
    EOS (the reference applies stop_words_list regardless of beam width,
    cpp/tensorrt_llm/layers/dynamicDecodeLayer.cpp:317-326)."""
    _check_early_stopping(gen)
    max_len = min(cfg.max_target_positions, gen.max_new_tokens + 1)
    return _compiled_beam(cfg, max_len, gen)(params, enc_states)


def _check_early_stopping(gen: GenerationConfig) -> None:
    if gen.early_stopping not in (True, False, "never"):
        raise ValueError(
            f"early_stopping must be True, False or 'never'; "
            f"got {gen.early_stopping!r}")


@functools.lru_cache(maxsize=16)
def _compiled_beam_prompted(cfg: WhisperConfig, max_len: int, prompt_len: int,
                            gen: GenerationConfig = GenerationConfig()):
    suppress_mask = lp.build_suppress_mask(cfg)
    begin_mask = lp.build_begin_suppress_mask(cfg)
    if gen.return_timestamps and cfg.no_timestamps_token_id is None:
        raise ValueError("timestamp decoding needs cfg.no_timestamps_token_id")
    # the prompt carries the forced prefix itself
    forced_map = np.full((max_len,), -1, np.int32)

    def fn(params, enc_states, prompt):
        return _beam_decode_impl(
            params, cfg, enc_states, max_len, gen.num_beams,
            gen.length_penalty,
            jnp.asarray(suppress_mask), jnp.asarray(begin_mask),
            jnp.asarray(forced_map), prompt_len, gen, prompt,
        )

    return jax.jit(fn)


def beam_decode_prompted(
    params: dict,
    cfg: WhisperConfig,
    enc_states: jnp.ndarray,
    prompt: jnp.ndarray,
    gen: GenerationConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beam search seeded with a full decoder prompt (B, P) — HF
    ``generate(decoder_input_ids=..., num_beams=K)`` semantics: the prompt
    is teacher-forced across every beam at zero score cost, the length
    penalty counts generated tokens only, and EOS retirement starts after
    the prompt. Completes the conditioned long-form feature matrix for
    beams (same loop, same processors). Returns (tokens (B, K, max_len)
    best-first, scores (B, K), lengths (B, K)). Supports the same
    early_stopping modes and stop-word retirement as ``beam_decode``
    (stop criteria are gated off inside the prompt window)."""
    _check_early_stopping(gen)
    prompt = jnp.asarray(prompt, jnp.int32)
    prompt_len = prompt.shape[1]
    max_len = min(cfg.max_target_positions,
                  gen.max_new_tokens + prompt_len)
    return _compiled_beam_prompted(cfg, max_len, prompt_len, gen)(
        params, enc_states, prompt)
