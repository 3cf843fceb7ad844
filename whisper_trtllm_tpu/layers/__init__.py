from whisper_trtllm_tpu.layers.init import (  # noqa: F401
    init_attention,
    init_conv1d,
    init_dense,
    init_embedding,
    init_layer_norm,
)
from whisper_trtllm_tpu.layers.transformer import (  # noqa: F401
    attention_qkv,
    mlp_block,
    split_heads,
    merge_heads,
)
