"""Beam search for decoder-only (causal) LMs, fully on device.

The reference's GenerationSession supports beam_width > 1 for every GPT-style
engine: the context phase runs at beam 1, then KV caches and logits are tiled
K-wide (`_tile_beam_width`, reference: tensorrt_llm/runtime/generation.py:30,
898-915), per-step beam bookkeeping runs in C++ online-softmax kernels with
`cache_indirection` ping-pong buffers (reference: cpp/tensorrt_llm/kernels/
onlineSoftmaxBeamsearchKernels.cu, generation.py:823-866,949-961) and the
result is reassembled by `gather_tree` (reference: cpp/tensorrt_llm/thop/
gatherTreeOp.cpp:74).

Here the same capability is one `lax.while_loop` over the model-agnostic
prefill/step contract of runtime.causal_lm: prefill runs once per utterance
(beam 1), caches are tiled beam-major with `jnp.repeat`, beam-parent cache
reorder is a `take_along_axis` gather (XLA lowers it to an on-device
shuffle — no indirection buffers), and the alive/finished-pool formulation
makes gather_tree unnecessary because every candidate row already carries its
full token history. Semantics are HF `generate(num_beams=K,
early_stopping=True)` — the same contract runtime/beam.py implements for
Whisper, parity-tested against HF torch beam search.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from whisper_trtllm_tpu.runtime.beam import NEG_INF, _gather_beams, _length_penalty


class _BeamLMState(NamedTuple):
    alive_tokens: jnp.ndarray     # (B, K, max_len)
    alive_scores: jnp.ndarray     # (B, K) cumulative log-prob
    finished_tokens: jnp.ndarray  # (B, K, max_len)
    finished_scores: jnp.ndarray  # (B, K) length-penalized
    finished_lengths: jnp.ndarray # (B, K) incl. the EOS token
    pos: jnp.ndarray              # scalar: last written column
    cache_k: jnp.ndarray          # (L, B*K, H, T, dh) beam-major
    cache_v: jnp.ndarray


def beam_generate_tokens(
    prefill: Callable,
    step: Callable,
    params: dict,
    prompt: jnp.ndarray,
    cache_shape: Tuple[int, ...],
    prompt_len: int,
    max_new_tokens: int,
    eos_token_id: int,
    num_beams: int,
    length_penalty: float = 1.0,
    cache_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Traced beam search: prompt (B, P) → (tokens (B, K, P+max_new_tokens)
    best-first, scores (B, K) length-penalized, lengths (B, K)).

    ``prefill``/``step`` follow the runtime.causal_lm contract; ``cache_shape``
    is the *untiled* (L, B, H, T, dh) shape with T >= P + max_new_tokens —
    the context phase runs at beam width 1 and the caches are tiled K-wide
    afterwards, exactly the reference's step-0 `_tile_beam_width` of presents
    (reference: tensorrt_llm/runtime/generation.py:898-915). Length penalty
    divides by gen_len**alpha over the generated length including the EOS
    token, prompt excluded (HF `(cur_len + 1 - decoder_prompt_len)`
    semantics); early_stopping=True (a batch lane stops accepting once K
    hypotheses finish).
    """
    if max_new_tokens < 1:
        raise ValueError("beam_generate_tokens needs max_new_tokens >= 1")
    b, p = prompt.shape
    if p != prompt_len:
        raise ValueError(f"prompt width {p} != prompt_len {prompt_len}")
    k = num_beams
    max_len = prompt_len + max_new_tokens

    # ---- context phase at beam 1, then tile beam-major ----
    cache_k = jnp.zeros(cache_shape, cache_dtype)
    cache_v = jnp.zeros(cache_shape, cache_dtype)
    logits0, cache_k, cache_v = prefill(params, prompt, cache_k, cache_v)
    cache_k = jnp.repeat(cache_k, k, axis=1)   # (L, B*K, H, T, dh)
    cache_v = jnp.repeat(cache_v, k, axis=1)

    alive_tokens = jnp.full((b, k, max_len), eos_token_id, jnp.int32)
    alive_tokens = jax.lax.dynamic_update_slice(
        alive_tokens, jnp.tile(prompt[:, None, :], (1, k, 1)), (0, 0, 0))
    # only beam 0 live initially (all beams identical before the first split)
    alive_scores = jnp.tile(
        jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)[None], (b, 1))

    def batch_done(fin_scores):
        # early stopping: a lane is done when its finished pool is full
        return jnp.all(fin_scores > NEG_INF / 2, axis=1)  # (B,)

    def expand(s: _BeamLMState, logits: jnp.ndarray, nxt: jnp.ndarray,
               ck: jnp.ndarray, cv: jnp.ndarray) -> _BeamLMState:
        """One beam expansion: raw step logits (B*K, V) → write column
        ``nxt``, refresh alive/finished pools, reorder caches to the
        surviving parents. Mirrors runtime/beam.py's body (the HF
        BeamSearchScorer.process semantics, parity-tested there)."""
        vocab = logits.shape[-1]
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1).reshape(b, k, vocab)

        cand = s.alive_scores[:, :, None] + logp                # (B, K, V)
        topv, topi = jax.lax.top_k(cand.reshape(b, k * vocab), 2 * k)
        parents = (topi // vocab).astype(jnp.int32)
        tok_ids = (topi % vocab).astype(jnp.int32)

        seqs = _gather_beams(s.alive_tokens, parents, b, k)     # (B, 2K, max)
        seqs = jax.lax.dynamic_update_slice(
            seqs, tok_ids[:, :, None], (0, 0, nxt))

        # EOS retirement rules (HF BeamSearchScorer.process): only EOS
        # candidates ranked within the top K retire; dead-beam ~NEG_INF
        # scores never retire (length-penalty division would otherwise lift
        # them over the done threshold).
        in_top_k = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * k), 1) < k
        is_eos_tok = tok_ids == eos_token_id
        is_eos = is_eos_tok & in_top_k & (topv > NEG_INF / 2)

        # alive set: best K non-EOS candidates (an EOS ranked >= K drops
        # entirely — it must not continue decoding conditioned on EOS)
        alive_cand = jnp.where(is_eos_tok, NEG_INF, topv)
        _, alive_sel = jax.lax.top_k(alive_cand, k)
        new_alive_scores = jnp.take_along_axis(alive_cand, alive_sel, axis=1)
        new_alive_tokens = _gather_beams(seqs, alive_sel, b, 2 * k)
        alive_parents = jnp.take_along_axis(parents, alive_sel, axis=1)

        # finished pool: merge EOS candidates, length-penalized by the
        # GENERATED length including the EOS token — HF divides by
        # (cur_len + 1 - decoder_prompt_len) ** length_penalty
        # (transformers generation/utils.py::_update_finished_beams), i.e.
        # the prompt does not count toward the penalty for decoder-only
        # models
        fin_cand = jnp.where(
            is_eos,
            topv / _length_penalty(nxt + 1 - prompt_len, length_penalty),
            NEG_INF)
        fin_cand = jnp.where(
            batch_done(s.finished_scores)[:, None], NEG_INF, fin_cand)
        merged_scores = jnp.concatenate([s.finished_scores, fin_cand], axis=1)
        merged_tokens = jnp.concatenate([s.finished_tokens, seqs], axis=1)
        merged_lengths = jnp.concatenate(
            [s.finished_lengths,
             jnp.full((b, 2 * k), nxt + 1, jnp.int32)], axis=1)
        _, fin_sel = jax.lax.top_k(merged_scores, k)
        new_fin_scores = jnp.take_along_axis(merged_scores, fin_sel, axis=1)
        new_fin_tokens = _gather_beams(merged_tokens, fin_sel, b, 3 * k)
        new_fin_lengths = jnp.take_along_axis(merged_lengths, fin_sel, axis=1)

        # reorder caches to the surviving alive parents (the
        # cache_indirection / gather_tree replacement)
        ck = _gather_beams(ck, alive_parents, b, k)
        cv = _gather_beams(cv, alive_parents, b, k)

        return _BeamLMState(
            new_alive_tokens, new_alive_scores,
            new_fin_tokens, new_fin_scores, new_fin_lengths,
            nxt, ck, cv)

    state = _BeamLMState(
        alive_tokens=alive_tokens,
        alive_scores=alive_scores,
        finished_tokens=jnp.full((b, k, max_len), eos_token_id, jnp.int32),
        finished_scores=jnp.full((b, k), NEG_INF),
        finished_lengths=jnp.zeros((b, k), jnp.int32),
        pos=jnp.int32(prompt_len - 1),
        cache_k=cache_k,
        cache_v=cache_v,
    )

    # first expansion from the context-phase logits (replicated per beam —
    # only beam 0 is live, so the replicas are masked out by alive_scores)
    state = expand(state, jnp.repeat(logits0, k, axis=0),
                   jnp.int32(prompt_len), state.cache_k, state.cache_v)

    def cond(s: _BeamLMState):
        return jnp.logical_and(
            s.pos < max_len - 1,
            ~jnp.all(batch_done(s.finished_scores)))

    def body(s: _BeamLMState):
        cur = jax.lax.dynamic_index_in_dim(
            s.alive_tokens, s.pos, axis=2, keepdims=False).reshape(b * k)
        logits, ck, cv = step(params, cur, s.pos, s.cache_k, s.cache_v)
        return expand(s, logits, s.pos + 1, ck, cv)

    final = jax.lax.while_loop(cond, body, state)

    # finalize: where the finished pool never filled, fall back to alive
    # beams penalized at their full generated length — HF's last iteration
    # retires every top-K candidate via the max-length stopping criterion
    # with the same (cur_len + 1 - decoder_prompt_len) denominator; lanes
    # that early-stopped discard their alive beams
    alive_len = final.pos + 1
    alive_final = final.alive_scores / _length_penalty(
        alive_len - prompt_len, length_penalty)
    alive_final = jnp.where(
        batch_done(final.finished_scores)[:, None], NEG_INF, alive_final)
    merged_scores = jnp.concatenate(
        [final.finished_scores, alive_final], axis=1)
    merged_tokens = jnp.concatenate(
        [final.finished_tokens, final.alive_tokens], axis=1)
    merged_lengths = jnp.concatenate(
        [final.finished_lengths,
         jnp.full((b, k), alive_len, jnp.int32)], axis=1)
    _, sel = jax.lax.top_k(merged_scores, k)
    out_tokens = _gather_beams(merged_tokens, sel, b, 2 * k)
    out_scores = jnp.take_along_axis(merged_scores, sel, axis=1)
    out_lengths = jnp.take_along_axis(merged_lengths, sel, axis=1)
    return out_tokens, out_scores, out_lengths


def make_generate_beam(prefill: Callable, step: Callable):
    """Wire a zoo family's (prefill, step) pair into a ready-made
    ``generate_beam(params, cfg, prompt, max_new_tokens, num_beams,
    length_penalty=1.0)`` — the reference enables beam_width>1 for EVERY
    engine through one GenerationSession (reference:
    tensorrt_llm/runtime/generation.py:898-975); this factory is the
    model-agnostic equivalent. Requires the standard config fields
    (n_layer/n_head/head_dim/n_positions/eos_token_id); families with
    non-standard caches (GQA) or step signatures keep bespoke wiring."""
    import functools

    @functools.lru_cache(maxsize=16)
    def compiled(cfg, prompt_len: int, max_new_tokens: int, num_beams: int,
                 length_penalty: float):
        def fn(params, prompt):
            b = prompt.shape[0]
            max_len = prompt_len + max_new_tokens
            return beam_generate_tokens(
                lambda p, t, ck, cv: prefill(p, cfg, t, ck, cv),
                lambda p, tok, pos, ck, cv: step(p, cfg, tok, pos, ck, cv),
                params, prompt,
                cache_shape=(cfg.n_layer, b, cfg.n_head, max_len,
                             cfg.head_dim),
                prompt_len=prompt_len, max_new_tokens=max_new_tokens,
                eos_token_id=cfg.eos_token_id, num_beams=num_beams,
                length_penalty=length_penalty,
            )

        return jax.jit(fn)

    def generate_beam(params, cfg, prompt, max_new_tokens: int,
                      num_beams: int, length_penalty: float = 1.0):
        # gpt: n_positions; opt/gptj/gptneox: max_positions; bloom: none
        # (ALiBi extrapolates)
        limit = getattr(cfg, "n_positions", None) or getattr(
            cfg, "max_positions", None)
        if limit and prompt.shape[1] + max_new_tokens > limit:
            raise ValueError(
                "prompt_len + max_new_tokens exceeds the position limit")
        return compiled(cfg, prompt.shape[1], max_new_tokens, num_beams,
                        float(length_penalty))(params, prompt)

    return generate_beam
