from whisper_trtllm_tpu.models.gptneox.model import (  # noqa: F401
    GPTNeoXConfig,
    convert_hf_gptneox,
    forward,
    generate,
    generate_beam,
    generate_ragged,
    init_params,
)
