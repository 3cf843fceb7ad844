"""Speculative decoding: a small draft model proposes, the target verifies.

Beyond the reference's feature set (SURVEY.md has no speculative path): the
draft (e.g. tiny.en) autoregresses GAMMA tokens; the target (e.g. medium.en)
scores all of them in ONE chunked pass (models/whisper/model.py::decode_chunk
— the context-phase op); the longest matching prefix is accepted plus the
target's own token at the first mismatch. Greedy speculative decoding is
*exact*: the output equals the target's plain greedy output token for token
(tests/test_speculative.py asserts this), while the target runs
len/accepted-per-round fewer sequential passes.

Stale cache slots past the acceptance point need no rewind: every attention
masks by current position, and the slots are overwritten on the next round
(the same static-shape insight as the main decode loop).

Batch 1 (the latency use case). Suppress/begin-suppress processors are
applied to both models; timestamps/forced prefixes are handled by processing
the prompt before speculation starts.
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


class SpecState(NamedTuple):
    tokens: jnp.ndarray     # (1, max_len)
    pos: jnp.ndarray        # index of last accepted token
    finished: jnp.ndarray   # scalar bool
    t_self: tuple           # target self-KV (k, v)
    d_self: tuple           # draft self-KV
    rounds: jnp.ndarray     # scalar i32 — speculation rounds executed (the
    #                         acceptance-rate denominator: each round costs
    #                         gamma draft steps + 1 target chunk pass)
    accepted: jnp.ndarray   # scalar i32 — draft proposals accepted across
    #                         rounds (exact, incl. EOS-truncated final
    #                         rounds where length-based accounting
    #                         undercounts)


def _apply_masks(logits, positions, suppress, begin_mask, begin_index):
    """positions: (S,) generated-token positions for each logits row."""
    logits = logits + suppress[None, None]
    at_begin = (positions == begin_index)[None, :, None]
    return jnp.where(at_begin, logits + begin_mask[None, None], logits)


@functools.lru_cache(maxsize=8)
def _compiled_speculative(
    t_cfg: WhisperConfig, d_cfg: WhisperConfig, max_len: int, gamma: int
):
    suppress_t = lp.build_suppress_mask(t_cfg)
    begin_t = lp.build_begin_suppress_mask(t_cfg)
    forced_map, begin_index = lp.build_forced_map(t_cfg, max_len)
    prompt_len = 1 + max(
        [p for p, _ in t_cfg.forced_decoder_ids], default=0
    )
    prompt_np = np.full((prompt_len,), t_cfg.decoder_start_token_id, np.int32)
    for p, tok in t_cfg.forced_decoder_ids:
        if p < prompt_len:
            prompt_np[p] = tok

    def fn(t_params, d_params, mel):
        sup = jnp.asarray(suppress_t)
        beg = jnp.asarray(begin_t)
        prompt = jnp.asarray(prompt_np)[None]                    # (1, P)

        # both encoders INSIDE the jit: the whole utterance is one device
        # dispatch (eager per-op encodes cost dozens of round trips through
        # a high-latency transport and dominated the round-4 spec_bench gap)
        t_enc = wmodel.encode(t_params, t_cfg, mel)
        d_enc = wmodel.encode(d_params, d_cfg, mel)
        t_cross = wmodel.compute_cross_kv(t_params, t_cfg, t_enc)
        d_cross = wmodel.compute_cross_kv(d_params, d_cfg, d_enc)
        t_self = wmodel.init_self_kv(t_cfg, 1, max_len, dtype=t_enc.dtype)
        d_self = wmodel.init_self_kv(d_cfg, 1, max_len, dtype=d_enc.dtype)

        tokens = jnp.full((1, max_len), t_cfg.pad_token_id, jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

        # process the prompt on both models (prefill); the last prompt
        # token's kv slot is written inside the speculation rounds
        if prompt_len > 1:
            _, t_self = wmodel.decode_chunk(
                t_params, t_cfg, prompt[:, :-1], jnp.int32(0), t_self, t_cross)
            _, d_self = wmodel.decode_chunk(
                d_params, d_cfg, prompt[:, :-1], jnp.int32(0), d_self, d_cross)

        state = SpecState(tokens, jnp.int32(prompt_len - 1),
                          jnp.asarray(False), t_self, d_self, jnp.int32(0),
                          jnp.int32(0))

        def cond(s: SpecState):
            return jnp.logical_and(s.pos < max_len - gamma - 1, ~s.finished)

        def body(s: SpecState):
            # ---- draft proposes gamma tokens ----
            def draft_step(j, carry):
                tokens, d_self = carry
                cur = jax.lax.dynamic_index_in_dim(
                    tokens, s.pos + j, axis=1, keepdims=False)
                logits, d_self = wmodel.decode_step_kv(
                    d_params, d_cfg, cur, s.pos + j, d_self, d_cross)
                logits = _apply_masks(
                    logits[:, None], (s.pos + j + 1)[None], sup, beg,
                    begin_index)[:, 0]
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, s.pos + j + 1))
                return tokens, d_self

            tokens, d_self = jax.lax.fori_loop(
                0, gamma, draft_step, (s.tokens, s.d_self))

            # ---- target verifies the gamma proposals in one chunk ----
            chunk_in = jax.lax.dynamic_slice(
                tokens, (0, s.pos), (1, gamma + 1))          # inputs
            t_logits, t_self = wmodel.decode_chunk(
                t_params, t_cfg, chunk_in, s.pos, s.t_self, t_cross)
            gen_positions = s.pos + 1 + jnp.arange(gamma + 1)
            t_logits = _apply_masks(t_logits, gen_positions, sup, beg,
                                    begin_index)
            t_choice = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)[0]

            proposals = jax.lax.dynamic_slice(
                tokens, (0, s.pos + 1), (1, gamma))[0]
            match = proposals == t_choice[:gamma]
            # number of accepted proposals = length of matching prefix
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
            bonus = t_choice[n_acc]                          # target's token
            new_pos = s.pos + n_acc + 1
            tokens = jax.lax.dynamic_update_slice(
                tokens, bonus[None, None], (0, new_pos))

            # EOS anywhere in the accepted region (incl. bonus) finishes
            accepted = jax.lax.dynamic_slice(
                tokens, (0, s.pos + 1), (1, gamma + 1))[0]
            in_range = jnp.arange(gamma + 1) <= n_acc
            finished = jnp.any(
                jnp.logical_and(in_range, accepted == t_cfg.eos_token_id))
            # freeze pos at the first EOS so lengths are exact
            eos_hit = jnp.logical_and(in_range, accepted == t_cfg.eos_token_id)
            first_eos_off = jnp.argmax(eos_hit)
            new_pos = jnp.where(finished, s.pos + 1 + first_eos_off, new_pos)
            return SpecState(tokens, new_pos, finished, t_self, d_self,
                             s.rounds + 1, s.accepted + n_acc)

        final = jax.lax.while_loop(cond, body, state)
        length = final.pos + 1
        return final.tokens, length, final.rounds, final.accepted

    return jax.jit(fn)


def speculative_transcribe_tokens(
    target_params: dict,
    target_cfg: WhisperConfig,
    draft_params: dict,
    draft_cfg: WhisperConfig,
    mel: jnp.ndarray,
    gen: Optional[GenerationConfig] = None,
    gamma: int = 4,
    with_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """mel (1, 3000, M) → (tokens (1, max_len), length). The token stream is
    identical to the target's plain greedy decode. ``with_stats=True`` also
    returns (rounds, accepted): the speculation-round count and the exact
    number of accepted draft proposals (counted in-loop — length-based
    accounting undercounts on EOS-truncated final rounds); acceptance rate
    = accepted/(gamma * rounds)."""
    gen = gen or GenerationConfig()
    assert mel.shape[0] == 1, "speculative decoding is a batch-1 latency path"
    max_len = min(target_cfg.max_target_positions, gen.max_new_tokens + 1)
    tokens, length, rounds, accepted = _compiled_speculative(
        target_cfg, draft_cfg, max_len, gamma
    )(target_params, draft_params, mel)
    if with_stats:
        return tokens, length, rounds, accepted
    return tokens, length
