from whisper_trtllm_tpu.models.gptj.model import (  # noqa: F401
    GPTJConfig,
    convert_hf_gptj,
    forward,
    generate,
    generate_beam,
    generate_ragged,
    init_params,
)
