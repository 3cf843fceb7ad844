"""Pallas TPU kernels for the hot attention paths.

TPU-native replacements for the reference's CUDA plugin kernels:
- flash_attention — encoder bidirectional fused MHA
  (≙ bertAttentionPlugin + contextFusedMultiHeadAttention cubins)
- decode_attention — single-token masked MHA against a static KV cache
  (≙ decoderMaskedMultiheadAttention + the WhisperDecoderAttention matrix)

Selection: kernels engage on the TPU backend unless disabled via
WHISPER_TPU_DISABLE_PALLAS=1 (the analog of PluginConfig feature flags,
reference: tensorrt_llm/plugin/plugin.py:33-140).
"""

import contextlib
import os

_disabled_depth = 0


@contextlib.contextmanager
def pallas_disabled():
    """Force the XLA fallbacks inside this scope. Debug/ablation hook (the
    analog of unsetting a PluginConfig flag). flash_mha defines a custom
    VJP, so even jax.grad no longer requires this; the decode kernels
    remain forward-only but sit off the training path."""
    global _disabled_depth
    _disabled_depth += 1
    try:
        yield
    finally:
        _disabled_depth -= 1


def pallas_enabled() -> bool:
    if _disabled_depth > 0:
        return False
    if os.environ.get("WHISPER_TPU_DISABLE_PALLAS") == "1":
        return False
    import jax

    return jax.default_backend() == "tpu"


def fused_decode_enabled() -> bool:
    """The fused whole-layer decode kernel
    (ops/pallas/fused_decoder_step.py) — opt-in via
    WHISPER_TPU_FUSED_DECODE=1 and gated by fused_layer_supported()
    (VMEM fit). Measured SLOWER than the XLA decode step on v5e at every
    block size tried (docs/PERFORMANCE.md), same verdict as the standalone
    decode/cross kernels: at one token per step XLA's scheduling beats
    Mosaic's sequential kernel body. Kept as a parity-tested ablation."""
    if os.environ.get("WHISPER_TPU_FUSED_DECODE") != "1":
        return False
    return pallas_enabled()


from whisper_trtllm_tpu.ops.pallas.flash_attention import flash_mha  # noqa: E402,F401
from whisper_trtllm_tpu.ops.pallas.decode_attention import (  # noqa: E402,F401
    decode_mha,
)
from whisper_trtllm_tpu.ops.pallas.fused_decoder_step import (  # noqa: E402,F401
    fused_decoder_layer_step,
    fused_layer_supported,
)
