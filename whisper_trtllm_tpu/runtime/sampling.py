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
