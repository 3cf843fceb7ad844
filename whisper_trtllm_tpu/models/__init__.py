"""Model zoo (analog of reference: tensorrt_llm/models/__init__.py).

``whisper`` is the flagship; further families (GPT-style decoder-only, BERT
encoder-only) reuse the same layers/ops and runtime.
"""

from whisper_trtllm_tpu.models import whisper  # noqa: F401
