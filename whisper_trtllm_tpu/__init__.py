"""whisper-trtllm_tpu — a TPU-native Whisper ASR serving framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
project EdVince/whisper-trtllm (see /root/repo/SURVEY.md), but an idiomatic
TPU-first design:

- ``audio``    — log-mel frontend (matmul DFT on the MXU; Pallas STFT kernel)
  replacing the reference's host-side numpy STFT
  (reference: transformers/src/transformers/models/whisper/feature_extraction_whisper.py:94-111).
- ``ops``      — the functional op library (analog of
  tensorrt_llm/functional.py) as pure jnp functions plus Pallas kernels for
  the hot attention paths (analog of bertAttentionPlugin /
  decoderMaskedMultiheadAttention).
- ``layers``   — the NN layer library (analog of tensorrt_llm/layers/).
- ``models``   — the model zoo; ``models.whisper`` is the flagship
  (analog of tensorrt_llm/models/whisper/model.py).
- ``runtime``  — sessions, generation (greedy/beam as a fully on-device
  ``lax.while_loop``), KV-cache management (analog of tensorrt_llm/runtime/).
- ``parallel`` — mesh/Mapping, partition specs, collectives-in-graph
  (analog of tensorrt_llm/mapping.py + ncclPlugin).
- ``utils``    — logger, profiler, checkpointing.
"""

__version__ = "0.1.0"

from whisper_trtllm_tpu.config import (  # noqa: F401
    WhisperConfig,
    GenerationConfig,
    RuntimeConfig,
    MeshConfig,
)
