"""Fine-tuning: teacher-forced cross-entropy + sharded train step.

The reference is inference-only (SURVEY.md §2d: DP "process-level only");
this module goes beyond it with a first-class pjit train step — parameters
sharded by parallel.partition specs (TP over 'model'), batches over 'data',
gradients psum'd by XLA from the shardings.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.models.whisper import model as wmodel


def cross_entropy_loss(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    loss_mask: jnp.ndarray,
    ga_weights: Optional[jnp.ndarray] = None,
    ga_scale: Optional[jnp.ndarray] = None,
    remat_encoder: bool = False,
) -> jnp.ndarray:
    """mel (B, T, M); tokens (B, S) incl. decoder_start; loss_mask (B, S-1)
    marks the target positions that count. ``ga_weights`` (S-1, T_enc) +
    ``ga_scale`` (scalar array): guided-attention LOSS — adds
    ga_scale * mean cross-attention mass outside the known word slots
    (guided_attn_weights); the gradient flows into the q/k projections, so
    the monotonic alignment is internalized. (An additive score BIAS was
    tried and rejected with measurements — round-4 commit trail: it routes
    position information around q/k and inference collapses without it.)"""
    # The only kernel on the teacher-forced path is flash_mha (encoder
    # self-attn + decoder cross-attn via flash_cross=True), which defines a
    # custom VJP — training runs straight through the fused kernel; no
    # pallas_disabled() needed. Inference decode_full defaults to
    # flash_cross=False for bitwise parity with decode_step.
    # per-layer encoder remat (jax.checkpoint on the scan body) is the
    # fit-enabling lever at medium+ dims: the whole-loss checkpoint below
    # does NOT bound the backward's peak (the recompute still materializes
    # every layer's internals at once) — measured 61 GB OOM at medium b16
    enc = wmodel.encode(params, cfg, mel, remat=remat_encoder)
    if ga_weights is not None:
        logits, ga_pen = wmodel.decode_full(
            params, cfg, tokens[:, :-1], enc, flash_cross=True,
            ga_weights=ga_weights, ga_row_mask=loss_mask)
    else:
        ga_pen = None
        logits = wmodel.decode_full(params, cfg, tokens[:, :-1], enc,
                                    flash_cross=True)  # fp32
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = loss_mask.astype(nll.dtype)
    loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if ga_pen is not None:
        loss = loss + (ga_scale if ga_scale is not None else 1.0) * ga_pen
    return loss


def guided_attn_weights(
    seq_len: int,
    enc_len: int,
    sigma: float = 10.0,
    lead_s: float = 0.1,
    word_s: float = 0.3,
    pos_per_s: float = 50.0,
):
    """Guided-attention LOSS penalty weights (numpy (seq_len, enc_len)
    f32): W[i, p] = 1 - exp(-(p - c_i)^2 / (2 sigma^2)) — high where
    cross-attention mass should NOT sit given the synthetic corpus's known
    slot grid. Row 0 (forced prefix) and rows whose slot falls past the
    encoder are zeroed (no constraint)."""
    import numpy as np

    i = np.arange(seq_len)[:, None]
    p = np.arange(enc_len)[None, :]
    center = (lead_s + (i - 1) * word_s + word_s / 2.0) * pos_per_s
    w = 1.0 - np.exp(-((p - center) ** 2) / (2.0 * sigma * sigma))
    w[0, :] = 0.0
    w[center[:, 0] > enc_len - 1, :] = 0.0
    return w.astype(np.float32)


def make_train_step(
    cfg: WhisperConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    mesh=None,
    remat: bool = False,
):
    """Returns (init_opt_state, jitted step). With a mesh, parameters keep
    their NamedShardings and the batch is expected sharded over 'data'.
    ``remat=True`` rematerializes the forward (jax.checkpoint) to trade HBM
    for FLOPs on memory-bound configs (SURVEY.md TPU guidance)."""
    optimizer = optimizer or optax.adamw(1e-4)
    import functools

    loss_fn = (functools.partial(cross_entropy_loss, remat_encoder=True)
               if remat else cross_entropy_loss)

    def step(params, opt_state, mel, tokens, loss_mask,
             ga_weights=None, ga_scale=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, mel, tokens, loss_mask, ga_weights, ga_scale
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def init_opt_state(params):
        return optimizer.init(params)

    return init_opt_state, jitted
