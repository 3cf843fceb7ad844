from whisper_trtllm_tpu.ops.functional import (  # noqa: F401
    ACT2FN,
    dense,
    embedding,
    gelu,
    layer_norm,
    rms_norm,
    softmax_fp32,
    sinusoid_position_embedding,
)
from whisper_trtllm_tpu.ops.attention import (  # noqa: F401
    mha,
    mha_decode_step,
    init_kv_cache,
    init_paged_kv_cache,
    paged_mha_decode_step,
    paged_prefill_update,
    paged_update_kv_cache,
)
