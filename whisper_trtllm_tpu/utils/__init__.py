from whisper_trtllm_tpu.utils.logger import logger  # noqa: F401
from whisper_trtllm_tpu.utils.profiler import Timer, profile_trace  # noqa: F401
