from whisper_trtllm_tpu.models.llama.model import (  # noqa: F401
    LlamaConfig,
    convert_hf_llama,
    forward,
    generate,
    generate_beam,
    generate_ragged,
    init_params,
)
