from whisper_trtllm_tpu.models.chatglm6b.model import (  # noqa: F401
    ChatGLM6BConfig,
    build_position_ids,
    convert_hf_chatglm6b,
    forward,
    generate,
    generate_beam,
    generate_ragged,
    init_params,
)
