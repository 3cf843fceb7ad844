"""Model-agnostic causal-LM generation loop.

Analog of the reference's GenerationSession (reference:
tensorrt_llm/runtime/generation.py:151-988) — one decode loop serving every
decoder-only zoo model. The reference parameterizes it by an engine's
tensor-name contract; here the contract is two jittable callables:

- ``prefill(params, tokens, cache_k, cache_v) -> (last_logits, ck, cv)`` —
  the context phase (gptAttentionPlugin context phase): run the whole
  prompt once, write K/V into the static caches, return the last position's
  logits (B, V) fp32.
- ``step(params, tok, pos, cache_k, cache_v) -> (logits, ck, cv)`` — the
  generation phase: one token for the whole batch, cache append at ``pos``.

The loop itself is the reference's C++ DynamicDecodeLayer pipeline
(penalties → sampling/greedy → EOS tracking → stop) as a fully on-device
``lax.while_loop`` — no per-step host round trip.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    """Static sampling knobs, mirroring the reference SamplingConfig
    (tensorrt_llm/runtime/generation.py:120-138) plus the DynamicDecodeLayer
    word-list inputs (bad_words_list / stop_words_list). Lives in jitted
    closures: scalars stay Python, word tables stay numpy (pad_word_list)."""
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    repetition_penalty: float = 1.0
    seed: int = 0
    do_sample: bool = False
    presence_penalty: float = 0.0
    min_new_tokens: int = 0
    bad_words: Optional[tuple] = None   # pad_word_list output (numpy)
    stop_words: Optional[tuple] = None  # pad_word_list output (numpy)


def _pick_token(smp, sc, key, logits, tokens, pos, gen_count, eos_token_id):
    """The DynamicDecodeLayer per-step pipeline: penalties → min-length →
    bad-words ban → sample/greedy (reference:
    cpp/tensorrt_llm/layers/dynamicDecodeLayer.cpp forward order)."""
    if sc is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if sc.repetition_penalty != 1.0:
        logits = smp.apply_repetition_penalty(
            logits, tokens, pos, sc.repetition_penalty)
    if sc.presence_penalty != 0.0:
        logits = smp.apply_presence_penalty(
            logits, tokens, pos, sc.presence_penalty)
    if sc.min_new_tokens > 0:
        logits = smp.apply_min_new_tokens(
            logits, gen_count, sc.min_new_tokens, eos_token_id)
    if sc.bad_words is not None:
        logits = smp.ban_bad_words(logits, tokens, pos, sc.bad_words)
    return smp.sample_token(
        key, logits, temperature=sc.temperature, top_k=sc.top_k,
        top_p=sc.top_p, do_sample=sc.do_sample,
    )


class _GenState(NamedTuple):
    tokens: jnp.ndarray
    pos: jnp.ndarray
    finished: jnp.ndarray
    cache_k: jnp.ndarray
    cache_v: jnp.ndarray
    key: jnp.ndarray


def generate_tokens(
    prefill: Callable,
    step: Callable,
    params: dict,
    prompt: jnp.ndarray,
    cache_shape: Tuple[int, ...],
    prompt_len: int,
    max_len: int,
    eos_token_id: int,
    sampling_cfg: Optional[tuple] = None,
    cache_dtype=jnp.float32,
) -> jnp.ndarray:
    """Traced generation: prompt (B, P) → tokens (B, max_len), positions at
    and after EOS hold eos_token_id. ``sampling_cfg`` is a SamplingParams
    built by make_sampling_cfg, or None for greedy (the reference's
    SamplingConfig knobs plus DynamicDecodeLayer word lists,
    tensorrt_llm/runtime/generation.py:120-138). A lane stopped by a
    stop-word match keeps the matched sequence in its output and pads the
    rest with eos."""
    from whisper_trtllm_tpu.runtime import sampling as smp

    if max_len <= prompt_len:
        raise ValueError(
            f"max_len ({max_len}) must exceed prompt_len ({prompt_len}): the "
            "prompt fills the context window, nothing can be generated "
            "(an out-of-bounds first-token write would be silently dropped)")
    sc = sampling_cfg
    b = prompt.shape[0]

    def pick(key, logits, tokens, pos):
        # generated-so-far count (candidate excluded): positions
        # [prompt_len, pos] hold generated tokens
        gen_count = pos + 1 - jnp.int32(prompt_len)
        return _pick_token(smp, sc, key, logits, tokens, pos, gen_count,
                           eos_token_id)

    cache_k = jnp.zeros(cache_shape, cache_dtype)
    cache_v = jnp.zeros(cache_shape, cache_dtype)
    logits, cache_k, cache_v = prefill(params, prompt, cache_k, cache_v)

    key0 = jax.random.PRNGKey(sc.seed if sc else 0)
    k_first, key0 = jax.random.split(key0)
    tokens = jnp.full((b, max_len), eos_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    first = pick(k_first, logits, tokens, jnp.int32(prompt_len - 1))
    tokens = tokens.at[:, prompt_len].set(first)

    finished0 = first == eos_token_id
    if sc is not None and sc.stop_words is not None:
        finished0 |= smp.match_stop_words(
            tokens, jnp.int32(prompt_len), sc.stop_words)
    state = _GenState(
        tokens, jnp.int32(prompt_len),
        finished0, cache_k, cache_v, key0,
    )

    def cond(s):
        return jnp.logical_and(s.pos < max_len - 1, ~jnp.all(s.finished))

    def body(s):
        cur = jax.lax.dynamic_index_in_dim(s.tokens, s.pos, 1, keepdims=False)
        logits, ck, cv = step(params, cur, s.pos, s.cache_k, s.cache_v)
        step_key, carry_key = jax.random.split(s.key)
        nxt = pick(step_key, logits, s.tokens, s.pos)
        nxt = jnp.where(s.finished, jnp.int32(eos_token_id), nxt)
        finished = jnp.logical_or(s.finished, nxt == eos_token_id)
        tokens = jax.lax.dynamic_update_slice(
            s.tokens, nxt[:, None], (0, s.pos + 1)
        )
        if sc is not None and sc.stop_words is not None:
            # a lane already finished keeps writing eos pads — exclude it
            # from fresh stop-word matches on those pads
            finished |= (~s.finished) & smp.match_stop_words(
                tokens, s.pos + 1, sc.stop_words)
        return _GenState(tokens, s.pos + 1, finished, ck, cv, carry_key)

    return jax.lax.while_loop(cond, body, state).tokens


class _RaggedState(NamedTuple):
    tokens: jnp.ndarray
    pos: jnp.ndarray          # (B,) next write index per lane
    t: jnp.ndarray            # scalar step counter
    finished: jnp.ndarray
    cache_k: jnp.ndarray
    cache_v: jnp.ndarray
    key: jnp.ndarray


def generate_tokens_ragged(
    prefill: Callable,
    step: Callable,
    params: dict,
    prompt: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    cache_shape: Tuple[int, ...],
    max_new_tokens: int,
    eos_token_id: int,
    sampling_cfg: Optional[tuple] = None,
    cache_dtype=jnp.float32,
) -> jnp.ndarray:
    """Variable-length batched generation: right-padded ``prompt`` (B, P)
    with per-row ``prompt_lens`` (B,) → tokens (B, P + max_new_tokens);
    row b holds its prompt, then its continuation starting at position
    prompt_lens[b], then eos padding.

    This is the reference's ragged-batch path — GenerationSession.decode
    takes per-row input_lengths and gathers context logits per row
    (reference: tensorrt_llm/runtime/generation.py:782 + functional.py:3316
    gather_last_token_logits; the RaggedTensor/remove_input_padding
    machinery). Contract differences vs the lockstep loop:

    - ``prefill(params, prompt, prompt_lens, ck, cv) -> (logits, ck, cv)``
      returns each row's logits at its OWN last valid position (B, V).
    - ``step(params, tok, pos, ck, cv)`` takes per-lane positions (B,)
      (per-lane cache writes + valid lengths — the same machinery the
      in-flight batcher uses, runtime/ifb.py).

    Right padding is safe under a causal mask: pad positions can only
    attend backward, and each lane's generated K/V overwrite the pad slots
    in order, with valid_len masking everything past the lane frontier.
    """
    from whisper_trtllm_tpu.runtime import sampling as smp

    if max_new_tokens < 1:
        raise ValueError("generate_tokens_ragged needs max_new_tokens >= 1 "
                         "(the first-token write indexes column prompt_len)")
    sc = sampling_cfg
    b, p = prompt.shape
    max_len = p + max_new_tokens
    lens = prompt_lens.astype(jnp.int32)

    def pick(key, logits, tokens, pos):
        gen_count = pos + 1 - lens        # (B,) per-lane generated count
        return _pick_token(smp, sc, key, logits, tokens, pos, gen_count,
                           eos_token_id)

    cache_k = jnp.zeros(cache_shape, cache_dtype)
    cache_v = jnp.zeros(cache_shape, cache_dtype)
    logits, cache_k, cache_v = prefill(params, prompt, lens, cache_k, cache_v)

    key0 = jax.random.PRNGKey(sc.seed if sc else 0)
    k_first, key0 = jax.random.split(key0)
    tokens = jnp.full((b, max_len), eos_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    # blank out right-pad garbage past each row's length
    col = jnp.arange(max_len)[None, :]
    tokens = jnp.where(col < lens[:, None], tokens, jnp.int32(eos_token_id))

    rows = jnp.arange(b)
    first = pick(k_first, logits, tokens, lens - 1)
    tokens = tokens.at[rows, lens].set(first)

    finished0 = first == eos_token_id
    if sc is not None and sc.stop_words is not None:
        finished0 |= smp.match_stop_words(tokens, lens, sc.stop_words)
    state = _RaggedState(
        tokens, lens, jnp.int32(1),
        finished0, cache_k, cache_v, key0,
    )

    def cond(s):
        return jnp.logical_and(s.t < max_new_tokens, ~jnp.all(s.finished))

    def body(s):
        cur = s.tokens[rows, s.pos]                     # last written per lane
        logits, ck, cv = step(params, cur, s.pos, s.cache_k, s.cache_v)
        step_key, carry_key = jax.random.split(s.key)
        nxt = pick(step_key, logits, s.tokens, s.pos)
        nxt = jnp.where(s.finished, jnp.int32(eos_token_id), nxt)
        finished = jnp.logical_or(s.finished, nxt == eos_token_id)
        pos = jnp.minimum(s.pos + 1, max_len - 1)
        write = jnp.where(s.finished, jnp.int32(eos_token_id), nxt)
        tokens = s.tokens.at[rows, pos].set(write)
        if sc is not None and sc.stop_words is not None:
            finished |= (~s.finished) & smp.match_stop_words(
                tokens, pos, sc.stop_words)
        return _RaggedState(tokens, pos, s.t + 1, finished, ck, cv, carry_key)

    return jax.lax.while_loop(cond, body, state).tokens


def make_sampling_cfg(temperature: float = 1.0, top_k: int = 0,
                      top_p: float = 0.0, repetition_penalty: float = 1.0,
                      seed: int = 0, do_sample: bool = False,
                      presence_penalty: float = 0.0, min_new_tokens: int = 0,
                      bad_words=None, stop_words=None
                      ) -> Optional[SamplingParams]:
    """None when every knob is neutral and sampling was not forced (pure
    greedy, no PRNG in the graph). ``do_sample=True`` requests a categorical
    draw even with neutral knobs (temperature-1 multinomial — the HF
    do_sample flag). ``bad_words``/``stop_words`` — lists of token-id lists
    (the reference DynamicDecodeLayer's bad_words_list / stop_words_list);
    padded to numpy tables here so they trace to constants."""
    from whisper_trtllm_tpu.runtime.sampling import pad_word_list

    if not (do_sample or temperature != 1.0 or top_k > 0
            or (0.0 < top_p < 1.0) or repetition_penalty != 1.0
            or presence_penalty != 0.0 or min_new_tokens > 0
            or bad_words or stop_words):
        return None
    return SamplingParams(
        temperature=temperature, top_k=top_k, top_p=top_p,
        repetition_penalty=repetition_penalty, seed=seed, do_sample=do_sample,
        presence_penalty=presence_penalty, min_new_tokens=min_new_tokens,
        bad_words=pad_word_list(bad_words) if bad_words else None,
        stop_words=pad_word_list(stop_words) if stop_words else None,
    )
