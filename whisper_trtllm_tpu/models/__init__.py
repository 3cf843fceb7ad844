"""Model zoo (analog of reference: tensorrt_llm/models/__init__.py).

``whisper`` is the flagship. The other families cover the reference zoo's
architectural archetypes, each HF-parity-tested:
- ``gpt``   — decoder-only, learned positions, fused QKV (≙ GPT/OPT/GPT-J
  style; reference models/gpt)
- ``llama`` — RMSNorm + RoPE + gated SiLU MLP + grouped-query attention
  (≙ LLaMA/GPT-NeoX style; reference models/llama)
- ``bloom`` — ALiBi positions, embedding LayerNorm, per-head-interleaved
  fused QKV (reference models/bloom)
- ``bert``  — encoder-only with attention masks (reference models/bert)
"""

from whisper_trtllm_tpu.models import whisper  # noqa: F401
