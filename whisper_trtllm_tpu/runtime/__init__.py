from whisper_trtllm_tpu.runtime.beam import beam_decode  # noqa: F401
from whisper_trtllm_tpu.runtime.generation import (  # noqa: F401
    greedy_decode,
    transcribe_tokens,
)
from whisper_trtllm_tpu.runtime.kv_cache_manager import (  # noqa: F401
    BlockLedger,
    PagedKVCache,
)
from whisper_trtllm_tpu.runtime.session import WhisperSession  # noqa: F401
