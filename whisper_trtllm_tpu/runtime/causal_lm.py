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
    and after EOS hold eos_token_id. ``sampling_cfg`` is the 6-tuple
    (temperature, top_k, top_p, repetition_penalty, seed, do_sample) built
    by make_sampling_cfg, or None for greedy (the reference's SamplingConfig
    knobs, tensorrt_llm/runtime/generation.py:120-138)."""
    from whisper_trtllm_tpu.runtime import sampling as smp

    if max_len <= prompt_len:
        raise ValueError(
            f"max_len ({max_len}) must exceed prompt_len ({prompt_len}): the "
            "prompt fills the context window, nothing can be generated "
            "(an out-of-bounds first-token write would be silently dropped)")
    sc = sampling_cfg
    b = prompt.shape[0]

    def pick(key, logits, tokens, pos):
        if sc is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        t, k, p, rep, _, do_sample = sc
        return smp.sample_token(
            key, logits, temperature=t, top_k=k, top_p=p,
            tokens=tokens, pos=pos, repetition_penalty=rep,
            do_sample=do_sample,
        )

    cache_k = jnp.zeros(cache_shape, cache_dtype)
    cache_v = jnp.zeros(cache_shape, cache_dtype)
    logits, cache_k, cache_v = prefill(params, prompt, cache_k, cache_v)

    key0 = jax.random.PRNGKey(sc[4] if sc else 0)
    k_first, key0 = jax.random.split(key0)
    tokens = jnp.full((b, max_len), eos_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    first = pick(k_first, logits, tokens, jnp.int32(prompt_len - 1))
    tokens = tokens.at[:, prompt_len].set(first)

    state = _GenState(
        tokens, jnp.int32(prompt_len),
        first == eos_token_id, cache_k, cache_v, key0,
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
        if sc is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        t, k, pp, rep, _, do_sample = sc
        return smp.sample_token(
            key, logits, temperature=t, top_k=k, top_p=pp,
            tokens=tokens, pos=pos, repetition_penalty=rep,
            do_sample=do_sample,
        )

    cache_k = jnp.zeros(cache_shape, cache_dtype)
    cache_v = jnp.zeros(cache_shape, cache_dtype)
    logits, cache_k, cache_v = prefill(params, prompt, lens, cache_k, cache_v)

    key0 = jax.random.PRNGKey(sc[4] if sc else 0)
    k_first, key0 = jax.random.split(key0)
    tokens = jnp.full((b, max_len), eos_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    # blank out right-pad garbage past each row's length
    col = jnp.arange(max_len)[None, :]
    tokens = jnp.where(col < lens[:, None], tokens, jnp.int32(eos_token_id))

    rows = jnp.arange(b)
    first = pick(k_first, logits, tokens, lens - 1)
    tokens = tokens.at[rows, lens].set(first)

    state = _RaggedState(
        tokens, lens, jnp.int32(1),
        first == eos_token_id, cache_k, cache_v, key0,
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
        return _RaggedState(tokens, pos, s.t + 1, finished, ck, cv, carry_key)

    return jax.lax.while_loop(cond, body, state).tokens


def make_sampling_cfg(temperature: float = 1.0, top_k: int = 0,
                      top_p: float = 0.0, repetition_penalty: float = 1.0,
                      seed: int = 0, do_sample: bool = False) -> Optional[tuple]:
    """None when every knob is neutral and sampling was not forced (pure
    greedy, no PRNG in the graph). ``do_sample=True`` requests a categorical
    draw even with neutral knobs (temperature-1 multinomial — the HF
    do_sample flag)."""
    if do_sample or temperature != 1.0 or top_k > 0 or (0.0 < top_p < 1.0) \
            or repetition_penalty != 1.0:
        return (temperature, top_k, top_p, repetition_penalty, seed, do_sample)
    return None
